"""Static HTML gallery (reference util/html.py, without the dominate dep).

Writes index.html with titled rows of images, used for train-time web
snapshots and inference result galleries.
"""

from __future__ import annotations

import html as _html
import os
from typing import List, Sequence


class HTML:
    def __init__(self, web_dir: str, title: str, refresh: int = 0):
        self.title = title
        self.web_dir = web_dir
        self.img_dir = os.path.join(web_dir, "images")
        self.refresh = refresh
        os.makedirs(self.img_dir, exist_ok=True)
        self._body: List[str] = []

    def get_image_dir(self) -> str:
        return self.img_dir

    def add_header(self, text: str) -> None:
        self._body.append(f"<h3>{_html.escape(str(text))}</h3>")

    def add_images(
        self,
        ims: Sequence[str],
        txts: Sequence[str],
        links: Sequence[str],
        width: int = 400,
    ) -> None:
        cells = []
        for im, txt, link in zip(ims, txts, links):
            cells.append(
                "<td style='text-align:center;vertical-align:top;padding:4px'>"
                f"<a href='images/{_html.escape(link)}'>"
                f"<img src='images/{_html.escape(im)}' width='{width}' "
                "style='image-rendering:pixelated'/></a><br/>"
                f"<span>{_html.escape(str(txt))}</span></td>"
            )
        self._body.append(
            "<table style='border-collapse:collapse'><tr>" + "".join(cells) + "</tr></table>"
        )

    def save(self) -> None:
        meta = (
            f"<meta http-equiv='refresh' content='{self.refresh}'>"
            if self.refresh > 0
            else ""
        )
        doc = (
            "<!DOCTYPE html><html><head>"
            f"<title>{_html.escape(self.title)}</title>{meta}</head>"
            f"<body><h1>{_html.escape(self.title)}</h1>"
            + "\n".join(self._body)
            + "</body></html>"
        )
        with open(os.path.join(self.web_dir, "index.html"), "w") as f:
            f.write(doc)
