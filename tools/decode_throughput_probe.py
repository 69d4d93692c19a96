"""Multimodal decode-throughput probe (round-4 verdict item 5).

The pure-Python PNG / baseline-JPEG decoders in `operators/multimodal.py`
are the SANDBOX RENDITION of a C codec (no image library exists in this
container); on a real deployment `decode_features`' `_decode_stub` is the
documented one-liner library swap (PIL / libjpeg-turbo / pyvips). This
probe measures the rendition's single-core throughput so the deployment
cost of NOT swapping is a number, not a guess.

Typical corpus thumbnails (256x256 RGB): encodes once with the from-spec
test encoders, then decodes repeatedly on one core through the SAME entry
points `decode_features` uses. Reports imgs/sec/core and MPix/s. A C
codec (libjpeg-turbo) does the same work at roughly 100-300 MPix/s/core —
the gap is the declared swap point, recorded in BENCH.md.

Usage: python tools/decode_throughput_probe.py [side] [out_json]
"""

import importlib.util
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from ckg_spark.operators import multimodal as MM  # noqa: E402


def _load_test_encoders():
    spec = importlib.util.spec_from_file_location(
        "tst_enc", os.path.join(ROOT, "tests", "test_similarity_textstats.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._encode_png, mod._encode_jpeg


def bench(decode, payload, min_s=3.0):
    decode(payload)  # warm
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < min_s:
        decode(payload)
        n += 1
    return n / (time.perf_counter() - t0)


def main():
    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    enc_png, enc_jpeg = _load_test_encoders()
    rng = np.random.default_rng(7)
    # realistic content: smooth gradient + noise (compresses like a photo)
    gx = np.linspace(0, 255, side)
    base = (gx[None, :] + gx[:, None]) / 2
    arr = np.clip(base[..., None] + rng.normal(0, 12, (side, side, 3)),
                  0, 255).astype(np.uint8)

    png = enc_png(arr, ctype=2, filters=(0, 1, 2, 3, 4))
    jpg = enc_jpeg(arr, sampling=(2, 2), dri=8)

    mpix = side * side / 1e6
    r_png = bench(MM.decode_png, png)
    r_jpg = bench(MM.decode_jpeg, jpg)
    result = {
        "image": f"{side}x{side} RGB",
        "png_bytes": len(png),
        "jpeg_bytes": len(jpg),
        "png_imgs_per_sec_core": round(r_png, 2),
        "png_mpix_per_sec_core": round(r_png * mpix, 2),
        "jpeg_imgs_per_sec_core": round(r_jpg, 2),
        "jpeg_mpix_per_sec_core": round(r_jpg * mpix, 2),
        "note": ("pure-Python sandbox rendition; deployment swaps "
                 "_decode_stub to PIL/libjpeg-turbo (~100-300 MPix/s/core)"),
    }
    print(json.dumps(result))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
