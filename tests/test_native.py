"""Native C++ image pipeline vs PIL reference — byte-level parity.

Pillow resamples in 8-bit fixed point; the native path uses float64, so
per-pixel differences up to ~2/255 (pre-normalization) are expected and
asserted. PNG decode itself must be exact.
"""

import io

import numpy as np
import pytest

from PIL import Image

from zsgnet_tpu.data import native
from zsgnet_tpu.data.dataset import IMAGENET_MEAN, IMAGENET_STD

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no compiler?)"
)


def _png_bytes(arr: np.ndarray, mode: str = "RGB") -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr, mode).save(buf, format="PNG")
    return buf.getvalue()


def _pil_reference(png: bytes, out_hw):
    with Image.open(io.BytesIO(png)) as im:
        im = im.convert("RGB")
        orig = (im.size[1], im.size[0])
        im = im.resize((out_hw[1], out_hw[0]), Image.BILINEAR)
        arr = np.asarray(im, np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD, orig


@pytest.mark.parametrize("shape", [(97, 121), (64, 64), (300, 200)])
def test_png_load_matches_pil_rgb(rng, shape):
    arr = rng.integers(0, 256, size=(*shape, 3)).astype(np.uint8)
    png = _png_bytes(arr)
    got, orig = native.png_load(png, (64, 64), IMAGENET_MEAN, IMAGENET_STD)
    want, orig_w = _pil_reference(png, (64, 64))
    assert orig == orig_w == shape
    # ≤2/255 pre-normalization → ≤2/255/std post-normalization
    tol = 2.5 / 255.0 / IMAGENET_STD.min()
    np.testing.assert_allclose(got, want, atol=tol)


def test_png_decode_exact_at_native_size(rng):
    """No resize (out == in) isolates the decoder: must match PIL exactly
    up to resampling identity (scale=1 triangle filter is identity)."""
    arr = rng.integers(0, 256, size=(40, 56, 3)).astype(np.uint8)
    png = _png_bytes(arr)
    got, _ = native.png_load(png, (40, 56), IMAGENET_MEAN, IMAGENET_STD)
    want = (arr.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_png_grayscale_and_rgba(rng):
    gray = rng.integers(0, 256, size=(30, 30)).astype(np.uint8)
    got, _ = native.png_load(_png_bytes(gray, "L"), (30, 30), IMAGENET_MEAN, IMAGENET_STD)
    want = (np.repeat(gray[..., None], 3, -1).astype(np.float32) / 255 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got, want, atol=1e-5)

    rgba = rng.integers(0, 256, size=(30, 30, 4)).astype(np.uint8)
    got2, _ = native.png_load(_png_bytes(rgba, "RGBA"), (30, 30), IMAGENET_MEAN, IMAGENET_STD)
    want2 = (rgba[..., :3].astype(np.float32) / 255 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(got2, want2, atol=1e-5)


def test_non_png_returns_none():
    assert native.png_load(b"\xff\xd8\xff not a png", (8, 8), IMAGENET_MEAN, IMAGENET_STD) is None


def test_resize_normalize_rgb_path(rng):
    arr = rng.integers(0, 256, size=(50, 70, 3)).astype(np.uint8)
    got = native.resize_normalize_rgb(arr, (25, 35), IMAGENET_MEAN, IMAGENET_STD)
    assert got is not None and got.shape == (25, 35, 3)
    im = Image.fromarray(arr).resize((35, 25), Image.BILINEAR)
    want = (np.asarray(im, np.float32) / 255 - IMAGENET_MEAN) / IMAGENET_STD
    tol = 2.5 / 255.0 / IMAGENET_STD.min()
    np.testing.assert_allclose(got, want, atol=tol)


def test_dataset_uses_native_for_png(tmp_path, rng):
    from zsgnet_tpu.config import Config
    from zsgnet_tpu.data import synthetic
    from zsgnet_tpu.data.dataset import get_data

    synthetic.generate(tmp_path, n_train=4, n_val=2, n_test=2, img_size=48)
    cfg = Config(ds_to_use="synthetic", data_dir=str(tmp_path), bs=2, nw=1,
                 resize_img=(48, 48), max_qlen=6, do_dist=False)
    s = get_data(cfg).train_dl.ds[0]
    assert s["img"].shape == (48, 48, 3)
    assert np.isfinite(s["img"]).all()


def _jpeg_bytes(arr: np.ndarray, quality: int = 90) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


@pytest.mark.skipif(
    not (native.available() and native.has_jpeg()),
    reason="native libjpeg decode unavailable",
)
@pytest.mark.parametrize("shape", [(97, 121), (300, 200)])
def test_jpeg_load_u8_matches_pil(rng, shape):
    """Native JPEG decode (system libjpeg — the library PIL links) is
    byte-identical to PIL at native size and ≤2/255 after resample."""
    arr = (rng.normal(0.5, 0.2, size=(*shape, 3)).clip(0, 1) * 255).astype(np.uint8)
    jpg = _jpeg_bytes(arr)
    # exact at native size
    got, orig = native.image_load_u8(jpg, shape)
    with Image.open(io.BytesIO(jpg)) as im:
        want = np.asarray(im.convert("RGB"), np.uint8)
    assert orig == shape
    np.testing.assert_array_equal(got, want)
    # resampled path within Pillow-parity tolerance
    got64, _ = native.image_load_u8(jpg, (64, 64))
    with Image.open(io.BytesIO(jpg)) as im:
        want64 = np.asarray(
            im.convert("RGB").resize((64, 64), Image.BILINEAR), np.uint8
        )
    assert np.abs(got64.astype(int) - want64.astype(int)).max() <= 2


@pytest.mark.skipif(
    not (native.available() and native.has_jpeg()),
    reason="native libjpeg decode unavailable",
)
def test_jpeg_load_float_and_grayscale(rng):
    arr = (rng.normal(0.5, 0.2, size=(50, 70, 3)).clip(0, 1) * 255).astype(np.uint8)
    jpg = _jpeg_bytes(arr)
    got, orig = native.image_load(jpg, (32, 32), IMAGENET_MEAN, IMAGENET_STD)
    want, orig_w = _pil_reference(jpg, (32, 32))
    assert orig == orig_w == (50, 70)
    tol = 2.5 / 255.0 / IMAGENET_STD.min()
    np.testing.assert_allclose(got, want, atol=tol)
    # grayscale JPEG → RGB expansion matches PIL
    gray = rng.integers(0, 256, size=(40, 40)).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(gray, "L").save(buf, "JPEG", quality=92)
    jb = buf.getvalue()
    got_g, _ = native.image_load_u8(jb, (40, 40))
    with Image.open(io.BytesIO(jb)) as im:
        want_g = np.asarray(im.convert("RGB"), np.uint8)
    np.testing.assert_array_equal(got_g, want_g)


def test_image_load_rejects_garbage():
    assert native.image_load_u8(b"not an image at all", (8, 8)) is None


# ---------------------------------------------------------------------------
# Fuzz: malformed inputs must NEVER crash the process — they return None
# (caller falls back to PIL) or a well-formed array. This drives the C
# error paths (PNG inflate bail-outs; libjpeg's setjmp/longjmp handler,
# including the mid-scanline abort the `volatile` fix covers).


def _assert_result_wellformed(out, resize_hw):
    if out is None:
        return
    img, orig = out
    assert img.shape == (*resize_hw, 3) and img.dtype == np.uint8
    assert len(orig) == 2


def test_fuzz_truncated_png(rng):
    arr = rng.integers(0, 256, size=(60, 80, 3)).astype(np.uint8)
    png = _png_bytes(arr)
    for frac in np.linspace(0.02, 0.98, 25):
        cut = png[: max(int(len(png) * frac), 1)]
        _assert_result_wellformed(native.image_load_u8(cut, (32, 32)), (32, 32))


@pytest.mark.skipif(not native.has_jpeg(), reason="no libjpeg")
def test_fuzz_truncated_jpeg(rng):
    arr = (rng.normal(0.5, 0.2, size=(60, 80, 3)).clip(0, 1) * 255).astype(np.uint8)
    jpg = _jpeg_bytes(arr)
    for frac in np.linspace(0.02, 0.98, 25):
        cut = jpg[: max(int(len(jpg) * frac), 1)]
        _assert_result_wellformed(native.image_load_u8(cut, (32, 32)), (32, 32))


def test_fuzz_bitflipped_files(rng):
    """Random single-byte corruptions across the whole file, both codecs."""
    arr = rng.integers(0, 256, size=(48, 48, 3)).astype(np.uint8)
    blobs = [_png_bytes(arr)]
    if native.has_jpeg():
        blobs.append(_jpeg_bytes(arr))
    for blob in blobs:
        b = bytearray(blob)
        for _ in range(60):
            pos = int(rng.integers(0, len(b)))
            old = b[pos]
            b[pos] = int(rng.integers(0, 256))
            _assert_result_wellformed(
                native.image_load_u8(bytes(b), (24, 24)), (24, 24)
            )
            b[pos] = old  # one flip at a time


def test_fuzz_magic_plus_noise(rng):
    """Valid signatures followed by noise — the headers parse, the body
    doesn't; decode must bail cleanly at any noise length."""
    png_sig = b"\x89PNG\r\n\x1a\n"
    jpeg_soi = b"\xff\xd8\xff\xe0"
    for sig in (png_sig, jpeg_soi):
        for n in (0, 1, 7, 64, 1024, 65536):
            noise = sig + bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
            _assert_result_wellformed(native.image_load_u8(noise, (16, 16)), (16, 16))
