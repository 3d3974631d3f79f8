"""Measure the PyTorch reference's training throughput on this host CPU.

The upstream repo publishes no numbers (BASELINE.md), so this script runs
the actual reference modules (imported read-only from /root/reference)
through their training step and records images/sec into
BASELINE_MEASURED.json for bench.py's vs_baseline ratio.

Environment substitutions (documented, both favoring the reference):
  * torchvision is absent -> RoIAlign is replaced by a pure-torch
    implementation of the same separable bilinear math (matmul form);
  * pretrained VGG16 cannot be downloaded (zero egress) -> the perceptual
    net is a hand-stacked VGG16-feature clone with random weights (same
    FLOPs as the reference's loss).

Usage: python benchmarks/measure_reference.py [--steps N] [--batch B]
"""

import argparse
import json
import os
import sys
import time
import types

import numpy as np
import torch
import torch.nn as nn

# --- import reference modules with a torchvision stub -----------------------
REFERENCE = "/root/reference"


class TorchRoIAlign(nn.Module):
    """Same-math stand-in for torchvision.ops.RoIAlign (sampling_ratio=1),
    as two bilinear interpolation matmuls per ROI."""

    def __init__(self, output_size=(128, 128), spatial_scale=1.0, sampling_ratio=1):
        super().__init__()
        self.out_h, self.out_w = output_size
        self.scale = spatial_scale

    @staticmethod
    def _axis_w(start, bin_size, out, size):
        i = torch.arange(out, dtype=torch.float32)
        pos = start + (i + 0.5) * bin_size
        valid = (pos >= -1.0) & (pos <= size)
        pos = pos.clamp(min=0.0)
        low = pos.floor()
        at_edge = low >= size - 1
        low = torch.where(at_edge, torch.full_like(low, size - 1), low)
        frac = torch.where(at_edge, torch.zeros_like(pos), pos - low)
        high = torch.where(at_edge, low, low + 1)
        cols = torch.arange(size, dtype=torch.float32)
        w = (cols[None, :] == low[:, None]) * (1 - frac)[:, None] + (
            cols[None, :] == high[:, None]
        ) * frac[:, None]
        return w * valid[:, None].float()

    def forward(self, feats, rois):
        # feats (B,C,H,W); rois (N,5) [batch_idx,x1,y1,x2,y2]
        B, C, H, W = feats.shape
        out = feats.new_zeros(rois.shape[0], C, self.out_h, self.out_w)
        for n in range(rois.shape[0]):
            b = int(rois[n, 0])
            x1, y1, x2, y2 = (rois[n, 1:] * self.scale).tolist()
            rw, rh = max(x2 - x1, 1.0), max(y2 - y1, 1.0)
            wy = self._axis_w(y1, rh / self.out_h, self.out_h, H)
            wx = self._axis_w(x1, rw / self.out_w, self.out_w, W)
            out[n] = torch.einsum("ih,chw,jw->cij", wy, feats[b], wx)
        return out


def _install_stubs():
    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_ops.RoIAlign = TorchRoIAlign
    tv_models = types.ModuleType("torchvision.models")
    tv_models.vgg16 = tv_models.vgg19 = None  # only touched by unused paths
    tv.ops = tv_ops
    tv.models = tv_models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv_ops
    sys.modules["torchvision.models"] = tv_models
    sys.path.insert(0, REFERENCE)


def _vgg16_features_random():
    cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512]
    layers, in_c = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(in_c, v, 3, padding=1), nn.ReLU(inplace=True)]
            in_c = v
    return nn.Sequential(*layers)


def measure_warp_gan(batch, size, steps):
    from modules.swapnet_modules import WarpModule
    from modules.discriminators import NLayerDiscriminator
    from modules import get_norm_layer
    import modules.loss as ref_loss

    G = WarpModule(3, 19)
    D = NLayerDiscriminator(22, 64, 3, get_norm_layer("instance"))
    crit = ref_loss.GANLoss("vanilla", smooth_labels=True)
    ce = nn.CrossEntropyLoss()
    opt_g = torch.optim.AdamW(G.parameters(), lr=1e-4, weight_decay=0)
    opt_d = torch.optim.AdamW(D.parameters(), lr=4e-4, weight_decay=0.01)

    bodys = torch.randn(batch, 3, size, size)
    cloths = torch.randn(batch, 19, size, size)
    targets = torch.randn(batch, 19, size, size)

    def step():
        fakes = G(bodys, cloths)
        opt_d.zero_grad()
        cond_fake = torch.cat([bodys, fakes], 1)
        cond_real = torch.cat([bodys, targets], 1)
        loss_d = 0.5 * (
            crit(D(cond_fake.detach()), False) + crit(D(cond_real), True)
        )
        loss_d.backward()
        opt_d.step()
        opt_g.zero_grad()
        loss_g = ce(fakes, targets.argmax(1)) * 100 + crit(D(torch.cat([bodys, fakes], 1)), True)
        loss_g.backward()
        opt_g.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return steps * batch / dt


def measure_texture_gan(batch, size, steps):
    from modules.swapnet_modules import TextureModule
    from modules.discriminators import NLayerDiscriminator
    from modules import get_norm_layer
    import modules.loss as ref_loss

    G = TextureModule(3, 19, 12, norm_type="instance", img_size=size)
    D = NLayerDiscriminator(22, 64, 3, get_norm_layer("instance"))
    crit = ref_loss.GANLoss("vanilla", smooth_labels=True)
    l1 = nn.L1Loss()
    mse = nn.MSELoss()
    vgg = _vgg16_features_random().eval()
    for p in vgg.parameters():
        p.requires_grad = False
    slices = [(0, 4), (4, 9), (9, 16), (16, 23), (23, 30)]
    opt_g = torch.optim.AdamW(G.parameters(), lr=1e-4, weight_decay=0)
    opt_d = torch.optim.AdamW(D.parameters(), lr=4e-4, weight_decay=0.01)

    textures = torch.randn(batch, 3, size, size)
    rois = torch.rand(batch, 12, 4) * (size / 2)
    rois[..., 2:] += rois[..., :2] + 4
    cloths = torch.randn(batch, 19, size, size)
    targets = torch.randn(batch, 3, size, size)

    def perceptual(x, y):
        cx, cy, total = x, y, 0.0
        for a, b in slices:
            for i in range(a, b):
                cx = vgg[i](cx)
                with torch.no_grad():
                    cy = vgg[i](cy)
            fx = cx / (cx.pow(2).sum(1, keepdim=True).sqrt() + 1e-8)
            fy = cy / (cy.pow(2).sum(1, keepdim=True).sqrt() + 1e-8)
            total = total + mse(fx, fy)
        return total

    def step():
        fakes = G(textures, rois, cloths)
        opt_d.zero_grad()
        loss_d = 0.5 * (
            crit(D(torch.cat([cloths, fakes], 1).detach()), False)
            + crit(D(torch.cat([cloths, targets], 1)), True)
        )
        loss_d.backward()
        opt_d.step()
        opt_g.zero_grad()
        loss_g = (
            crit(D(torch.cat([cloths, fakes], 1)), True)
            + l1(fakes, targets) * 10
            + perceptual(fakes, targets) * 20
        )
        loss_g.backward()
        opt_g.step()

    step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0
    return steps * batch / dt


def measure_warp_inference(size, steps):
    """Warp-stage-only forward (batch 1, eval) — the BASELINE config-1
    analog (reference inference.py:129-159 without the dataset/IO)."""
    from modules.swapnet_modules import WarpModule

    G1 = WarpModule(3, 19).eval()
    body = torch.randn(1, 3, size, size)
    cloth = torch.randn(1, 19, size, size)
    times = []
    with torch.no_grad():
        for _ in range(steps + 1):
            t0 = time.perf_counter()
            G1(body, cloth)
            times.append(time.perf_counter() - t0)
    return float(np.median(times[1:]))


def measure_swap_latency(size, steps):
    """Per-pair two-stage swap (warp fwd -> texture fwd), batch 1 eval."""
    from modules.swapnet_modules import WarpModule, TextureModule

    G1 = WarpModule(3, 19).eval()
    G2 = TextureModule(3, 19, 12, norm_type="instance", img_size=size).eval()
    body = torch.randn(1, 3, size, size)
    cloth = torch.randn(1, 19, size, size)
    tex = torch.randn(1, 3, size, size)
    rois = torch.rand(1, 12, 4) * (size / 2)
    rois[..., 2:] += rois[..., :2] + 4

    times = []
    with torch.no_grad():
        for _ in range(steps + 1):
            t0 = time.perf_counter()
            warped = G1(body, cloth)
            out = G2(tex, rois, warped)
            times.append(time.perf_counter() - t0)
    return float(np.median(times[1:]))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=128)
    args = ap.parse_args()

    _install_stubs()
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 8)

    warp_ips = measure_warp_gan(args.batch, args.size, args.steps)
    print(f"reference warp GAN train: {warp_ips:.3f} images/sec (CPU)")
    tex_ips = measure_texture_gan(args.batch, args.size, args.steps)
    print(f"reference texture GAN train: {tex_ips:.3f} images/sec (CPU)")
    swap_lat = measure_swap_latency(args.size, args.steps)
    print(f"reference two-stage swap p50: {swap_lat * 1000:.1f} ms (CPU, batch 1)")
    warp_lat = measure_warp_inference(args.size, args.steps)
    print(f"reference warp-only inference p50: {warp_lat * 1000:.1f} ms (CPU, batch 1)")

    out = {
        "hardware": f"host CPU ({os.cpu_count()} threads), torch {torch.__version__}",
        "notes": "reference modules from /root/reference; RoIAlign replaced by "
                 "same-math torch op (torchvision absent); VGG16 random weights "
                 "(no pretrained download). See benchmarks/measure_reference.py.",
        "config": {"batch": args.batch, "size": args.size, "steps": args.steps},
        "warp_gan_train_images_per_sec": round(warp_ips, 3),
        "texture_gan_train_images_per_sec": round(tex_ips, 3),
        "two_stage_swap_p50_ms": round(swap_lat * 1000, 2),
        "warp_inference_p50_ms": round(warp_lat * 1000, 2),
    }
    path = os.path.join(os.path.dirname(__file__), "..", "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {os.path.abspath(path)}")
