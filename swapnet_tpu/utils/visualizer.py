"""Training/inference observability (reference util/visualizer.py).

Channels kept from the reference:
  * console + append-only loss_log.txt with t_comp/t_data metrics
    (visualizer.py:86-90,212-229)
  * HTML snapshot gallery of current visuals per epoch
    (visualizer.py:163-184) under {checkpoints_dir}/{name}/web/
  * save_images() galleries for inference results (visualizer.py:21-47)

The visdom live-dashboard channel (reference visualizer.py:103-209) is
replaced by web/live.html — an auto-refreshing page of the CURRENT batch
visuals + loss curves (utils/dashboard.py), optionally served over HTTP
with --serve_dashboard at --display_port.  A JSONL metrics file
(metrics.jsonl) is added for programmatic consumption.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np

from swapnet_tpu.data.files import remove_extension
from swapnet_tpu.data.image_io import save_rgb
from swapnet_tpu.utils.html import HTML


class Visualizer:
    def __init__(self, opt):
        self.opt = opt
        self.name = opt.name
        self.use_html = opt.is_train and not getattr(opt, "no_html", False)
        self.win_size = getattr(opt, "display_winsize", 256)
        self.saved = False

        self.log_dir = os.path.join(opt.checkpoints_dir, opt.name)
        os.makedirs(self.log_dir, exist_ok=True)
        if self.use_html:
            self.web_dir = os.path.join(self.log_dir, "web")
            self.img_dir = os.path.join(self.web_dir, "images")
            os.makedirs(self.img_dir, exist_ok=True)
        self.log_name = os.path.join(self.log_dir, "loss_log.txt")
        self.metrics_name = os.path.join(self.log_dir, "metrics.jsonl")
        with open(self.log_name, "a") as f:
            now = time.strftime("%c")
            f.write(f"================ Training Loss ({now}) ================\n")

        self._dashboard_server = None
        if self.use_html and getattr(opt, "serve_dashboard", False):
            from swapnet_tpu.utils.dashboard import serve_directory

            self._dashboard_server = serve_directory(
                self.log_dir, getattr(opt, "display_port", 8097)
            )

    def reset(self):
        self.saved = False

    def display_current_results(self, visuals: Dict[str, np.ndarray], epoch: int, save_result: bool):
        """Save the current visuals dict {name: (B,H,W,3) uint8} to the web dir."""
        if not self.use_html or not (save_result or not self.saved):
            return
        self.saved = True
        for label, image in visuals.items():
            img = np.asarray(image)
            if img.ndim == 4:
                img = img[0]
            save_rgb(img, os.path.join(self.img_dir, f"epoch{epoch:03d}_{label}.png"))
            # "latest" copies back the live page (stable filenames so the
            # refreshing browser always sees the current batch)
            save_rgb(img, os.path.join(self.img_dir, f"latest_{label}.png"))
        # regenerate the loss curve (the visdom line-plot replacement)
        from swapnet_tpu.utils.loss_plot import write_loss_plot

        write_loss_plot(self.log_dir)
        from swapnet_tpu.utils.dashboard import read_last_metrics, write_live_page

        write_live_page(
            self.web_dir, self.name, list(visuals), epoch,
            last_metrics=read_last_metrics(self.metrics_name),
            refresh_secs=getattr(self.opt, "display_refresh_secs", 5),
        )
        webpage = HTML(self.web_dir, f"Experiment name = {self.name}", refresh=0)
        webpage.add_header("training losses")
        webpage._body.append(
            "<p><object type='image/svg+xml' data='../loss_plot.svg' "
            "width='720' height='320'></object></p>"
        )
        for n in range(epoch, 0, -1):
            webpage.add_header(f"epoch [{n}]")
            ims, txts, links = [], [], []
            for label in visuals:
                fname = f"epoch{n:03d}_{label}.png"
                if os.path.exists(os.path.join(self.img_dir, fname)):
                    ims.append(fname)
                    txts.append(label)
                    links.append(fname)
            if ims:
                webpage.add_images(ims, txts, links, width=self.win_size)
        webpage.save()

    @staticmethod
    def just_print_losses(epoch, losses: Dict[str, float], print_func=print):
        msg = f"(epoch: {epoch}) " + " ".join(
            f"{k}: {float(v):.3f}" for k, v in losses.items()
        )
        print_func(msg)

    def print_current_losses(
        self, epoch, iters, losses: Dict[str, float], t_comp, t_data, print_func=print
    ):
        msg = f"(epoch: {epoch}, iters: {iters}, time: {t_comp:.3f}, data: {t_data:.3f}) "
        msg += " ".join(f"{k}: {float(v):.3f}" for k, v in losses.items())
        print_func(msg)
        with open(self.log_name, "a") as f:
            f.write(msg + "\n")
        with open(self.metrics_name, "a") as f:
            f.write(
                json.dumps(
                    {
                        "epoch": int(epoch),
                        "iters": int(iters),
                        "t_comp": float(t_comp),
                        "t_data": float(t_data),
                        **{k: float(v) for k, v in losses.items()},
                    }
                )
                + "\n"
            )


def save_images(webpage: HTML, visuals: Dict[str, np.ndarray], image_path: str, width: int = 256):
    """Save a row of visuals to an inference gallery (reference
    visualizer.py:21-47)."""
    image_dir = webpage.get_image_dir()
    short_path = os.path.basename(image_path)
    name = remove_extension(short_path)

    webpage.add_header(name)
    ims, txts, links = [], [], []
    for label, im_data in visuals.items():
        img = np.asarray(im_data)
        if img.ndim == 4:
            img = img[0]
        image_name = f"{name}_{label}.png"
        save_rgb(img, os.path.join(image_dir, image_name))
        ims.append(image_name)
        txts.append(label)
        links.append(image_name)
    webpage.add_images(ims, txts, links, width=width)
