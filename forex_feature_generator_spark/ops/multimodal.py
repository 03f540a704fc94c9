"""Multimodal columns: image/audio/video as opaque `binary` columns with typed
metadata. The Spark-side plumbing (schema, partitioning, Arrow batch shape,
mapInPandas signatures) is real and tested. Decode comes in three tiers:

  * REAL for uncompressed formats, no codec libraries needed: `raw_decoder`
    parses actual netpbm P5/P6, uncompressed 24-bpp BMP and PCM WAV headers;
    `decode_raw_pixels` + `resize_raw_assets` do genuine pixel decode and
    nearest-neighbor resize (output hashes are of the actual resized
    buffer). Pixel-exact tests in tests/test_ops.py.
  * INJECTABLE for compressed formats (JPEG/PNG/MP4/...): pass any
    `decoder=` callable (a PIL/pyav/librosa implementation drops in).
  * STUBBED default otherwise — a deterministic fake keyed on the content
    hash (oracle-expressible), or NotImplementedError when `strict`.

At 100 TB the pattern is: binary assets in their own parquet column chunk
(never shuffled), metadata extracted once via Arrow-batched mapInPandas with
`spark.sql.execution.arrow.maxRecordsPerBatch` bounding executor memory, and
downstream joins on the compact metadata only."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

ASSET_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("modality", StringType()),      # image | audio | video
    StructField("content", BinaryType()),
    StructField("mime", StringType()),
])

DECODED_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("modality", StringType()),
    StructField("n_bytes", LongType()),
    StructField("sha256", StringType()),
    StructField("width", IntegerType()),        # image/video (fake-decoded)
    StructField("height", IntegerType()),
    StructField("n_frames", IntegerType()),     # video
    StructField("sample_rate", IntegerType()),  # audio
])


def _fake_decode(digest: bytes, modality: str) -> tuple:
    """Deterministic stand-in for the real decoder: derives plausible
    dimensions from the sha256 content digest so tests are stable AND the
    whole stub is a pure function of the bytes — expressible in the DuckDB
    oracle (q23)."""
    h = digest
    return (
        64 + h[0] % 192 if modality in ("image", "video") else None,
        64 + h[1] % 192 if modality in ("image", "video") else None,
        1 + h[2] % 300 if modality == "video" else None,
        (8000, 16000, 44100)[h[3] % 3] if modality == "audio" else None,
    )


def fake_decoder(content: bytes, modality: str) -> tuple:
    """The default `decoder=` callable. INJECTION SEAM for real media
    decoding: pass any callable (content: bytes, modality: str) ->
    (width, height, n_frames, sample_rate) — a PIL/pyav/librosa-backed
    implementation drops into decode_assets / resize_assets / frame_sample
    without touching call sites (tests/test_ops.py proves the injection
    with a header-parsing decoder)."""
    return _fake_decode(hashlib.sha256(content).digest(), modality)


def _resolve_decoder(decoder, strict: bool, what: str):
    if decoder is not None:
        return decoder
    if strict:
        raise NotImplementedError(
            f"real {what} requires media libraries absent in this "
            "environment — inject one via decoder=")
    return fake_decoder


def decode_assets(assets: DataFrame, strict: bool = False,
                  decoder=None) -> DataFrame:
    """Arrow-batched metadata extraction. The per-batch pandas work is the
    ONLY Python in this module (columnar list comprehensions, no iterrows);
    everything upstream/downstream is columnar. decoder: optional real
    decoder callable (see fake_decoder); strict without one raises."""
    dec = _resolve_decoder(decoder, strict, "media decoding")

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = [bytes(c or b"") for c in pdf["content"]]
            digests = [hashlib.sha256(c).digest() for c in contents]
            metas = [dec(c, m) for c, m in zip(contents, pdf["modality"])]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"].to_numpy(),
                "modality": pdf["modality"].to_numpy(),
                "n_bytes": [len(c) for c in contents],
                "sha256": [d.hex() for d in digests],
                "width": pd.array([m[0] for m in metas], dtype="Int32"),
                "height": pd.array([m[1] for m in metas], dtype="Int32"),
                "n_frames": pd.array([m[2] for m in metas], dtype="Int32"),
                "sample_rate": pd.array([m[3] for m in metas], dtype="Int32"),
            })

    return assets.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("modality", StringType()),
    StructField("src_width", IntegerType()),
    StructField("src_height", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("resized_sha256", StringType()),
])


def resize_assets(assets: DataFrame, target_w: int = 64, target_h: int = 64,
                  strict: bool = False, decoder=None) -> DataFrame:
    """Aspect-fit resize plumbing (never upscales). Source dims come from
    the decoder (injectable — see fake_decoder); the pixel work itself stays
    keyed as sha256(hex(sha256(content)) + ':WxH') so every output column is
    a pure function of the bytes and oracle-checkable; the Arrow batch shape
    and schema are what a PIL-backed implementation drops into."""
    dec = _resolve_decoder(decoder, strict, "image resizing")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            contents = [bytes(c or b"") for c in pdf["content"]]
            digests = [hashlib.sha256(c).digest() for c in contents]
            dims = [dec(c, m)[:2]
                    for c, m in zip(contents, pdf["modality"])]
            rows = []
            for d, (w, h) in zip(digests, dims):
                if w is None:
                    rows.append((None, None, None))
                    continue
                scale = min(target_w / w, target_h / h, 1.0)
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                key = d.hex() + f":{ow}x{oh}"
                rows.append((ow, oh, hashlib.sha256(key.encode()).hexdigest()))
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"].to_numpy(),
                "modality": pdf["modality"].to_numpy(),
                "src_width": pd.array([x[0] for x in dims], dtype="Int32"),
                "src_height": pd.array([x[1] for x in dims], dtype="Int32"),
                "width": pd.array([r[0] for r in rows], dtype="Int32"),
                "height": pd.array([r[1] for r in rows], dtype="Int32"),
                "resized_sha256": [r[2] for r in rows],
            })

    return assets.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("asset_id", StringType()),
    StructField("n_frames", IntegerType()),
    StructField("frame_idx", IntegerType()),
])


def frame_sample(assets: DataFrame, k: int = 8, decoder=None) -> DataFrame:
    """Uniform frame sampling for video assets: k evenly spaced frame
    indices floor(i * n_frames / k), deduplicated for short clips —
    the standard vision-pretraining sampling plan. Frame COUNTS come from
    the decoder (injectable — see fake_decoder); the plan explodes to one
    row per sampled frame (what a real decoder would feed the feature
    extractor)."""
    dec = decoder or fake_decoder

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"asset_id": [], "n_frames": [], "frame_idx": []}
            for aid, c, m in zip(pdf["asset_id"], pdf["content"],
                                 pdf["modality"]):
                if m != "video":
                    continue
                n = dec(bytes(c or b""), m)[2]
                for idx in sorted({i * n // k for i in range(k)}):
                    out["asset_id"].append(aid)
                    out["n_frames"].append(n)
                    out["frame_idx"].append(idx)
            yield pd.DataFrame({
                "asset_id": out["asset_id"],
                "n_frames": pd.array(out["n_frames"], dtype="Int32"),
                "frame_idx": pd.array(out["frame_idx"], dtype="Int32"),
            })

    return assets.mapInPandas(batches, schema=FRAME_SCHEMA)


def documents_as_assets(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Adapter for tests/benchmarks: treats document text bytes as binary
    image-like assets so the plumbing can be exercised without media files."""
    return docs.select(
        F.col(id_col).cast("string").alias("asset_id"),
        F.lit("image").alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"))


# ---------------------------------------------------------------------------
# REAL decode for uncompressed container formats (round 5). The sandbox has
# no codec libraries, but netpbm PPM/PGM, uncompressed 24-bpp BMP and PCM
# WAV need none — their headers and pixel/sample layouts are parsed here
# with numpy only, which upgrades the decode path from "injectable stub"
# to "real for uncompressed formats". Compressed formats (JPEG/PNG/MP4/...)
# remain the documented `decoder=` injection seam.
# ---------------------------------------------------------------------------


def _ppm_header(b: bytes):
    """Parses 'P6'/'P5' netpbm headers (whitespace + '#' comments per spec).
    Returns (fmt, width, height, maxval, pixel_offset) or None."""
    if len(b) < 2 or b[0:1] != b"P" or b[1:2] not in (b"5", b"6"):
        return None
    fmt = b[:2].decode()
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(b):
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b"#":                 # comment to end of line
            while pos < len(b) and b[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos:pos + 1].isspace():
            pos += 1
        if pos == start:
            return None
        fields.append(int(b[start:pos]))
    if len(fields) < 3:
        return None
    pos += 1                                       # single whitespace after maxval
    w, h, maxval = fields
    # A CRLF-written header leaves the '\n' of the "\r\n" separator inside
    # the pixel data, silently shifting every decoded byte (round-5
    # advice). The spec says ONE whitespace byte, so only consume the LF
    # when the byte-count check proves it is separator, not pixel data.
    ch = 3 if fmt == "P6" else 1
    need = w * h * ch * (2 if maxval > 255 else 1)
    if (b[pos - 1:pos] == b"\r" and b[pos:pos + 1] == b"\n"
            and len(b) - pos - 1 >= need):
        pos += 1
    if len(b) - pos < need:
        return None                                # truncated pixel data
    return fmt, w, h, maxval, pos


def _bmp_header(b: bytes):
    """Uncompressed 24-bpp BITMAPINFOHEADER BMP. Returns
    (width, height, top_down, pixel_offset) or None."""
    import struct
    if len(b) < 54 or b[:2] != b"BM":
        return None
    pixel_off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    compression = struct.unpack_from("<I", b, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        return None
    return w, abs(h), h < 0, pixel_off


def _wav_header(b: bytes):
    """PCM RIFF/WAVE. Returns (sample_rate, n_channels) or None."""
    import struct
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    n_channels = struct.unpack_from("<H", b, 22)[0]
    sample_rate = struct.unpack_from("<I", b, 24)[0]
    return sample_rate, n_channels


def raw_decoder(content: bytes, modality: str) -> tuple:
    """REAL decoder for uncompressed formats, drop-in for the `decoder=`
    seam: (width, height, n_frames, sample_rate) from actual file headers.
    Supports netpbm P5/P6, uncompressed 24-bpp BMP, and PCM WAV; anything
    else raises ValueError (compressed formats need a codec-backed decoder
    injected — this function never fakes)."""
    if modality in ("image", "video"):
        ppm = _ppm_header(content)
        if ppm is not None:
            _, w, h, _, _ = ppm
            return (w, h, 1 if modality == "video" else None, None)
        bmp = _bmp_header(content)
        if bmp is not None:
            w, h, _, _ = bmp
            return (w, h, 1 if modality == "video" else None, None)
    elif modality == "audio":
        wav = _wav_header(content)
        if wav is not None:
            return (None, None, None, wav[0])
    raise ValueError(
        f"raw_decoder: unrecognized/compressed {modality} bytes — inject a "
        "codec-backed decoder via decoder= for this format")


def decode_raw_pixels(content: bytes):
    """Pixel array (numpy uint8, H x W x 3 RGB) from PPM/PGM/BMP bytes."""
    import numpy as np
    ppm = _ppm_header(content)
    if ppm is not None:
        fmt, w, h, maxval, off = ppm
        if maxval > 255:
            raise ValueError("16-bit netpbm not supported")
        ch = 3 if fmt == "P6" else 1
        px = np.frombuffer(content, dtype=np.uint8, count=w * h * ch,
                           offset=off).reshape(h, w, ch)
        return np.repeat(px, 3, axis=2) if ch == 1 else px.copy()
    bmp = _bmp_header(content)
    if bmp is not None:
        import numpy as np
        w, h, top_down, off = bmp
        stride = (w * 3 + 3) & ~3                  # rows padded to 4 bytes
        rows = np.frombuffer(content, dtype=np.uint8, count=stride * h,
                             offset=off).reshape(h, stride)[:, :w * 3]
        img = rows.reshape(h, w, 3)[:, :, ::-1]    # BGR -> RGB
        return img if top_down else img[::-1]      # bottom-up -> top-down
    raise ValueError("decode_raw_pixels: not PPM/PGM/BMP bytes")


def resize_nearest(img, target_w: int, target_h: int):
    """Aspect-fit nearest-neighbor resize (never upscales) — the same
    geometry rule as resize_assets, on REAL pixels. Pure numpy indexing."""
    import numpy as np
    h, w = img.shape[:2]
    scale = min(target_w / w, target_h / h, 1.0)
    ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
    xi = (np.arange(ow) * (w / ow)).astype(np.int64).clip(0, w - 1)
    yi = (np.arange(oh) * (h / oh)).astype(np.int64).clip(0, h - 1)
    return img[yi][:, xi]


def resize_raw_assets(assets: DataFrame, target_w: int = 64,
                      target_h: int = 64) -> DataFrame:
    """REAL resize for uncompressed image assets: decodes PPM/PGM/BMP
    pixels, nearest-neighbor aspect-fit resizes them, and emits the sha256
    of the ACTUAL resized RGB buffer (not a key derived from the source
    hash). Same Arrow-batched mapInPandas shape as resize_assets — binary
    never shuffled, one pass, executor memory bounded by the Arrow batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            src_w, src_h, out_w, out_h, shas = [], [], [], [], []
            for c in pdf["content"]:
                img = decode_raw_pixels(bytes(c or b""))
                r = resize_nearest(img, target_w, target_h)
                src_h.append(img.shape[0]); src_w.append(img.shape[1])
                out_h.append(r.shape[0]); out_w.append(r.shape[1])
                shas.append(hashlib.sha256(
                    r.astype("uint8").tobytes()).hexdigest())
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"].to_numpy(),
                "modality": pdf["modality"].to_numpy(),
                "src_width": pd.array(src_w, dtype="Int32"),
                "src_height": pd.array(src_h, dtype="Int32"),
                "width": pd.array(out_w, dtype="Int32"),
                "height": pd.array(out_h, dtype="Int32"),
                "resized_sha256": shas,
            })

    return assets.mapInPandas(batches, schema=RESIZED_SCHEMA)
