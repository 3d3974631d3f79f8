"""Native C++ image decode kernels (native/decoder.cpp) vs PIL.

The native path must agree with the PIL decode + PIL BILINEAR resize the
datasets otherwise use (reference loads via PIL, datasets/data_utils.py),
within fixed-point rounding (±1/255).
"""

import io

import numpy as np
import pytest
from PIL import Image

from swapnet_tpu.data import native
from swapnet_tpu.data.image_io import load_rgb_resized

pytestmark = pytest.mark.skipif(
    not native.has_image_decode(),
    reason="native image decode unavailable (no libjpeg/libpng at build)",
)


def _img(seed=0, h=176, w=176):
    r = np.random.RandomState(seed)
    img = (r.rand(h, w, 3) * 255).astype(np.uint8)
    # smooth: raw noise stresses JPEG into visible quant differences
    return np.asarray(Image.fromarray(img).resize((w, h), Image.BILINEAR))


def _encode(img, fmt, **kw):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, fmt, **kw)
    return buf.getvalue()


@pytest.mark.parametrize("fmt", ["JPEG", "PNG"])
def test_decode_resize_matches_pil(fmt):
    data = _encode(_img(), fmt, quality=95) if fmt == "JPEG" else _encode(_img(), fmt)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    pil_resized = np.asarray(Image.fromarray(pil).resize((128, 128), Image.BILINEAR))
    out = native.decode_rgb_resized(data, 128)
    assert out is not None and out.shape == (128, 128, 3)
    assert np.abs(out.astype(int) - pil_resized.astype(int)).max() <= 1


def test_decode_reports_original_dims():
    data = _encode(_img(h=150, w=200), "PNG")
    out, (w, h) = native.decode_rgb_resized(data, 64, with_dims=True)
    assert (w, h) == (200, 150)
    # draft mode must still report PRE-scale dims (ROI scaling depends on it)
    data = _encode(_img(h=512, w=640), "JPEG", quality=90)
    out, (w, h) = native.decode_rgb_resized(data, 64, jpeg_draft=True, with_dims=True)
    assert (w, h) == (640, 512)


def test_png_same_size_passthrough_is_exact():
    img = _img(h=128, w=128)
    out = native.decode_rgb_resized(_encode(img, "PNG"), 128)
    assert np.array_equal(out, img)


def test_upscale_matches_pil():
    img = _img(h=64, w=64)
    out = native.decode_rgb_resized(_encode(img, "PNG"), 128)
    pil = np.asarray(Image.fromarray(img).resize((128, 128), Image.BILINEAR))
    assert np.abs(out.astype(int) - pil.astype(int)).max() <= 1


def test_jpeg_draft_matches_pil_draft():
    """DCT-scaled decode must match PIL's Image.draft path (same libjpeg
    mechanism): draft to the smallest power-of-2 scale >= target, then
    bilinear resample."""
    data = _encode(_img(h=512, w=512), "JPEG", quality=90)
    im = Image.open(io.BytesIO(data))
    im.draft("RGB", (64, 64))  # PIL picks the same 1/8 scale
    pil = np.asarray(
        Image.fromarray(np.asarray(im.convert("RGB"))).resize((64, 64), Image.BILINEAR)
    )
    draft = native.decode_rgb_resized(data, 64, jpeg_draft=True)
    assert np.abs(draft.astype(int) - pil.astype(int)).max() <= 1


def test_batch_threaded_equals_single():
    items = [
        _encode(_img(seed=s, h=96 + s, w=80 + 2 * s), "JPEG", quality=92)
        for s in range(7)
    ] + [_encode(_img(seed=9), "PNG"), b"not an image"]
    arr, failed = native.decode_rgb_resized_batch(items, 64, nthreads=4)
    assert arr.shape == (9, 64, 64, 3)
    assert failed == [8]  # the garbage buffer, and only it
    for i in range(8):
        single = native.decode_rgb_resized(items[i], 64)
        assert np.array_equal(arr[i], single), i


def test_batch_with_dims_reports_originals():
    items = [
        _encode(_img(seed=1, h=150, w=200), "PNG"),
        _encode(_img(seed=2, h=512, w=640), "JPEG", quality=90),
    ]
    arr, failed, whs = native.decode_rgb_resized_batch(
        items, 64, nthreads=2, with_dims=True
    )
    assert failed == []
    assert whs.tolist() == [[200, 150], [640, 512]]
    # draft decode must also report PRE-scale dims (ROI scaling needs them)
    _, _, whs_d = native.decode_rgb_resized_batch(
        items, 64, jpeg_draft=True, nthreads=2, with_dims=True
    )
    assert whs_d.tolist() == [[200, 150], [640, 512]]


def test_load_rgb_resized_many(tmp_path):
    from swapnet_tpu.data.image_io import load_rgb_resized_many

    paths = []
    for s, fmt in [(0, "JPEG"), (1, "PNG"), (2, "BMP")]:  # BMP: PIL fallback
        p = tmp_path / f"x{s}.{fmt.lower()}"
        Image.fromarray(_img(seed=s, h=150 + s, w=200)).save(p)
        paths.append(str(p))
    many = load_rgb_resized_many(paths, 64, "native")
    assert set(many) == set(paths)
    for s, p in enumerate(paths):
        img, w = many[p]
        single_img, single_w = load_rgb_resized(p, 64, "native")
        assert w == single_w == 200
        assert np.array_equal(img, single_img), p
    # pil backend: plain per-item dict
    many_pil = load_rgb_resized_many(paths, 64, "pil")
    assert all(many_pil[p][1] == 200 for p in paths)


def test_load_rgb_resized_backends(tmp_path):
    img = _img()
    p = tmp_path / "x.jpg"
    Image.fromarray(img).save(p, quality=95)
    pil_img, pil_w = load_rgb_resized(str(p), 128, "pil")
    nat_img, nat_w = load_rgb_resized(str(p), 128, "native")
    assert pil_w == nat_w == 176
    assert np.abs(pil_img.astype(int) - nat_img.astype(int)).max() <= 1
    # unknown format falls back to PIL silently
    p2 = tmp_path / "x.bmp"
    Image.fromarray(img).save(p2)
    bmp_img, bmp_w = load_rgb_resized(str(p2), 128, "native")
    assert bmp_w == 176 and bmp_img.shape == (128, 128, 3)
