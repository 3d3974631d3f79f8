"""Quality evaluation harness.

The reference has no quantitative evaluation at all (SURVEY.md §6); this
green-field harness scores a trained generator against ground truth so
training runs can be compared numerically.  One jitted metric program per
batch; metrics accumulate on host.

Stage-appropriate metrics:
  * warp (segmentation logits): argmax pixel accuracy + mean IoU from a
    globally accumulated confusion matrix,
  * texture (images): L1 / PSNR / SSIM, plus FID computed from Fréchet
    statistics of pooled deep features.  NOTE: pretrained InceptionV3
    weights are not obtainable in this offline environment, so the FID
    backbone is the VGG16 feature extractor (ported weights via
    --vgg_checkpoint when available, else fixed random init — a valid
    relative metric between runs, NOT comparable to published
    Inception-FID numbers).

Used by evaluate.py:
    python evaluate.py --checkpoint checkpoints --dataroot data/deep_fashion
"""

from __future__ import annotations

import json
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from swapnet_tpu.losses.extra import ssim


def batch_metrics(fakes: jax.Array, targets: jax.Array, max_val: float = 2.0) -> Dict[str, jax.Array]:
    """Per-batch quality metrics for [-1, 1]-ish image tensors.

    max_val=2.0 treats the tanh output range [-1, 1] as the dynamic range
    for PSNR/SSIM.
    """
    f = fakes.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    l1 = jnp.mean(jnp.abs(f - t))
    mse = jnp.mean(jnp.square(f - t))
    psnr = 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))
    s = ssim(f, t, max_val=max_val)
    return {"l1": l1, "mse": mse, "psnr": psnr, "ssim": s}


def confusion_matrix(logits: jax.Array, target_onehot: jax.Array) -> jax.Array:
    """(C, C) confusion counts[pred, true] from argmax of both tensors.

    One one-hot matmul on the MXU instead of a scatter: preds as one-hot
    (N*H*W, C) transposed against targets as one-hot.
    """
    C = logits.shape[-1]
    pred = jax.nn.one_hot(jnp.argmax(logits, -1).reshape(-1), C, dtype=jnp.float32)
    true = jax.nn.one_hot(
        jnp.argmax(target_onehot, -1).reshape(-1), C, dtype=jnp.float32
    )
    return pred.T @ true


def segmentation_scores(conf: np.ndarray) -> Dict[str, float]:
    """Pixel accuracy + mean IoU over classes present in pred or target."""
    conf = np.asarray(conf, np.float64)
    tp = np.diag(conf)
    union = conf.sum(0) + conf.sum(1) - tp
    present = union > 0
    iou = tp[present] / union[present]
    return {
        "pixel_acc": float(tp.sum() / max(conf.sum(), 1.0)),
        "mean_iou": float(iou.mean()) if present.any() else 0.0,
    }


# ---------------------------------------------------------------------------
# FID — Fréchet distance between feature distributions
# ---------------------------------------------------------------------------


def make_vgg_feature_fn(vgg_variables=None, image_size: int = 128):
    """Pooled relu4_3 VGG16 features (512-d) as the FID backbone.

    Inception weights are unreachable offline; see module docstring for
    the comparability caveat.  Inputs are expected in roughly [-1, 1].
    """
    from swapnet_tpu.models.vgg import VGG16Features

    vgg = VGG16Features()
    if vgg_variables is None:
        vgg_variables = vgg.init(
            jax.random.key(7), jnp.zeros((1, image_size, image_size, 3))
        )

    @jax.jit
    def features(x):
        taps = vgg.apply(vgg_variables, x.astype(jnp.float32))
        return jnp.mean(taps[3], axis=(1, 2))  # relu4_3, global average pool

    return features


def frechet_distance(feat_a: np.ndarray, feat_b: np.ndarray) -> float:
    """FID = |mu_a - mu_b|^2 + tr(Sa + Sb - 2 (Sa^1/2 Sb Sa^1/2)^1/2).

    The matrix square roots use symmetric eigendecompositions (clamping
    tiny negative eigenvalues), which is numerically safer than scipy's
    non-symmetric sqrtm and keeps everything in numpy.
    """
    a = np.asarray(feat_a, np.float64)
    b = np.asarray(feat_b, np.float64)
    mu_a, mu_b = a.mean(0), b.mean(0)
    sa = np.cov(a, rowvar=False)
    sb = np.cov(b, rowvar=False)

    def _sqrtm_psd(m):
        vals, vecs = np.linalg.eigh((m + m.T) / 2)
        vals = np.clip(vals, 0.0, None)
        return (vecs * np.sqrt(vals)) @ vecs.T

    sa_half = _sqrtm_psd(sa)
    covmean = _sqrtm_psd(sa_half @ sb @ sa_half)
    diff = mu_a - mu_b
    return float(diff @ diff + np.trace(sa) + np.trace(sb) - 2.0 * np.trace(covmean))


def evaluate_system(
    system, state, loader, preprocess,
    kind: str = "image",
    fid_feature_fn=None,
) -> Dict[str, float]:
    """Run the generator over a loader and compute stage metrics.

    kind="segmentation": warp stage — logits vs one-hot targets.
    kind="image": texture stage — L1/PSNR/SSIM (+ FID when
    fid_feature_fn is given).
    """
    metric_fn = jax.jit(batch_metrics)
    conf_fn = jax.jit(confusion_matrix)
    eval_fn = jax.jit(system.eval_step)

    from swapnet_tpu.data.loader import array_part

    sums: Dict[str, float] = {}
    weight = 0
    conf_total: Optional[np.ndarray] = None
    fake_feats, real_feats = [], []
    for batch in loader:
        model_batch = preprocess(None, array_part(batch))
        fakes = eval_fn(state, model_batch)
        targets = system.targets(model_batch)
        n = fakes.shape[0]
        if kind == "segmentation":
            conf = np.asarray(conf_fn(fakes, targets))
            conf_total = conf if conf_total is None else conf_total + conf
        else:
            m = metric_fn(fakes, targets)
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v) * n
            if fid_feature_fn is not None:
                fake_feats.append(np.asarray(fid_feature_fn(fakes)))
                real_feats.append(np.asarray(fid_feature_fn(targets)))
        weight += n

    out = {k: v / max(weight, 1) for k, v in sums.items()}
    if conf_total is not None:
        out.update(segmentation_scores(conf_total))
    if fake_feats:
        out["fid_vgg"] = frechet_distance(
            np.concatenate(fake_feats), np.concatenate(real_feats)
        )
    return out
