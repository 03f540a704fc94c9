"""Media-decode throughput probe (round 6): measures the REAL no-deps
decode paths — image pixel decode + resize (PPM / BMP / PNG / GIF /
JPEG baseline / JPEG progressive) and WAV payload decode (PCM16 /
G.711 mu-law / IMA ADPCM) — in assets/sec through the SAME Arrow-batched
mapInPandas ops the engine ships (`resize_raw_assets`, `audio_stats_raw`),
at local[32] on a deterministic synthetic corpus.

Purpose: quantify the documented `decoder=` fast-path rationale with a
measured point. The format encoders are imported from the test suite
(tests/test_ops.py) — the same independent in-test encoders the
pixel/sample-exact correctness tests use, so the probe bytes are known
decodable and the decode work is real. numpy-vectorized formats
(PPM/BMP/PNG rows, G.711 expansion) should clock orders of magnitude
above the bit-by-bit Python entropy decoders (GIF LZW, JPEG Huffman) —
the measured gap IS the argument for injecting a codec-backed decoder
at 100 TB while keeping the pure-Python tier as the correctness anchor.

Usage: python BENCH/media_probe.py   -> one JSON line +
BENCH/media_probe_results.json
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from forex_feature_generator_spark.engine import session  # noqa: E402
from forex_feature_generator_spark.ops import multimodal as MM  # noqa: E402

N_UNIQUE = 512          # encoded in the driver (the in-test encoders are
                        # deliberately simple, so encoding is the slow part)
REPLICAS = 8            # each unique blob appears this many times; decode
                        # work is real per asset, so 4096 assets per format
                        # push the measurement past per-task fixed costs
N_ASSETS = N_UNIQUE * REPLICAS
IMG_SHAPE = (48, 64)    # decoded pixels per image asset
WAV_SAMPLES = 8001      # frames per audio asset (1 + 8k for ADPCM blocks)


def _load_test_encoders():
    spec = importlib.util.spec_from_file_location(
        "t_ops", os.path.join(REPO, "tests", "test_ops.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build_images(t):
    rng = np.random.default_rng(1234)
    h, w = IMG_SHAPE
    gy, gx = np.mgrid[0:h, 0:w]
    out = {"ppm": [], "bmp": [], "png": [], "gif": [],
           "jpeg_baseline": [], "jpeg_progressive": []}
    for i in range(N_UNIQUE):
        img = np.clip(((gy * 3 + gx * 2 + i) % 256)[:, :, None]
                      + rng.integers(-20, 20, size=(h, w, 3)),
                      0, 255).astype(np.uint8)
        out["ppm"].append(t._ppm_bytes(w, h, img))
        out["bmp"].append(t._bmp_bytes(w, h, img))
        out["png"].append(t._png_bytes(img))
        # GIF: 64-color quantized frame (the test encoder is palette-based)
        pal = np.stack([np.arange(0, 256, 4)] * 3, axis=1).astype(np.uint8)
        out["gif"].append(t._gif_bytes((img[:, :, 0] >> 2).astype(np.uint8),
                                       pal))
        out["jpeg_baseline"].append(t._jpeg_bytes(img)[0])
        out["jpeg_progressive"].append(t._jpeg_prog_bytes(img)[0])
    return out


def _build_audio(t):
    rng = np.random.default_rng(99)
    x = (4000 * np.sin(np.arange(WAV_SAMPLES) / 3)
         + rng.integers(-500, 500, size=WAV_SAMPLES)).astype(np.int16)
    pcm = t._wav_container(1, 1, 16000, 16, 2, x.tobytes())
    mu = t._wav_container(7, 1, 8000, 8, 1, t._mulaw_compress(x))
    spb = WAV_SAMPLES
    balign = 4 + (spb - 1) // 2
    blk, _, _ = t._ima_encode_block(x[:, None], [0])
    ima = t._wav_container(0x11, 1, 16000, 4, balign, blk,
                           extra=(2).to_bytes(2, "little")
                           + spb.to_bytes(2, "little"))
    return {"wav_pcm16": [pcm] * N_ASSETS, "wav_mulaw": [mu] * N_ASSETS,
            "wav_ima_adpcm": [ima] * N_ASSETS}


def main():
    t = _load_test_encoders()
    spark = session.get_spark()
    results = {"n_assets": N_ASSETS, "img_shape": list(IMG_SHAPE),
               "wav_samples": WAV_SAMPLES, "formats": {}}

    def run(fmt, blobs, op):
        blobs = (blobs * REPLICAS)[:N_ASSETS]
        rows = [(f"{fmt}{i}", "image", bytearray(b),
                 "application/octet-stream")
                for i, b in enumerate(blobs)]
        df = spark.createDataFrame(rows, MM.ASSET_SCHEMA) \
                  .repartition(32).persist()
        df.count()                       # materialize input, park in cache
        op(df).count()                   # untimed warm-up (JIT + Arrow)
        t0 = time.time()
        n = op(df).count()
        dt = time.time() - t0
        df.unpersist()
        results["formats"][fmt] = {
            "assets_per_sec": round(n / dt, 1),
            "sec": round(dt, 2),
            "bytes_per_asset": len(blobs[0]),
        }
        print(f"  {fmt}: {n / dt:,.0f} assets/s ({dt:.2f}s)",
              file=sys.stderr)

    imgs = _build_images(t)
    for fmt, blobs in imgs.items():
        run(fmt, blobs, lambda d: MM.resize_raw_assets(d, 32, 32))
    for fmt, blobs in _build_audio(t).items():
        run(fmt, blobs, MM.audio_stats_raw)

    out = os.path.join(REPO, "BENCH", "media_probe_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
