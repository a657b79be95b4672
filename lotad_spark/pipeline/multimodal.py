"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Convention: a media table carries ``content binary`` plus typed metadata
columns (``media_type string``, ``n_bytes bigint``, …). Decode /
feature-extraction / resize run as Arrow-batched ``mapInPandas`` stages.

Decode kernel tiers: (1) PIL when importable (not in this container);
(2) otherwise a REAL pure-Python header parse for the public
zero-dependency formats — BMP (``BM`` + BITMAPINFOHEADER) and netpbm
P1-P6 (PPM/PGM/PBM) — returning the same (width, height, mode) PIL
would; (3) for payloads in neither format, a clearly-marked
deterministic fake derives dimensions from the byte length (STUB — a
corrupt or exotic payload must yield a row, not kill the stage). The
Spark-side plumbing — output schema, batch iteration, partition
preservation — is identical across tiers; swapping in libvips/ffmpeg
changes only the inner function.

Scale notes: ``mapInPandas`` streams Arrow batches — no row-at-a-time
Python, no driver collect; binary payloads never shuffle (decode before
any wide stage and project the bytes away).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

try:  # real decoder if available; this container has none
    from PIL import Image as _PIL_Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

DECODE_SCHEMA = "width int, height int, mode string"


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for image decoding: dimensions derived from
    the byte length (STUB — replace with PIL/libvips in production)."""
    n = len(payload)
    return (n % 256, (n // 256) % 256 + 1, "STUB")


# PIL-compatible mode strings per netpbm magic (P1/P4 bitmap, P2/P5
# graymap, P3/P6 pixmap) and BMP bits-per-pixel.
_PNM_MODE = {"P1": "1", "P2": "L", "P3": "RGB", "P4": "1", "P5": "L", "P6": "RGB"}
_BMP_MODE = {1: "1", 4: "P", 8: "P", 24: "RGB", 32: "RGBA"}


def _parse_bmp(payload: bytes) -> tuple[int, int, str] | None:
    """REAL decode of a BMP header (public format, zero deps): ``BM``
    magic + BITMAPINFOHEADER width/height/bpp at fixed offsets. Height is
    signed — negative means top-down row order, dimensions unchanged.
    Returns None when the payload is not BMP."""
    if len(payload) < 30 or payload[:2] != b"BM":
        return None
    import struct

    # The width/height/bpp offsets below are BITMAPINFOHEADER layout
    # (DIB header size >= 40). A BITMAPCOREHEADER BMP (size 12, 16-bit
    # width/height at different offsets) would decode to garbage
    # dimensions here — fall through instead of trusting them.
    if struct.unpack_from("<I", payload, 14)[0] < 40:
        return None
    width = struct.unpack_from("<i", payload, 18)[0]
    height = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if width <= 0 or height == 0:
        return None
    return (width, abs(height), _BMP_MODE.get(bpp, f"BMP{bpp}"))


def _parse_pnm(payload: bytes) -> tuple[int, int, str] | None:
    """REAL decode of a netpbm (P1-P6 PBM/PGM/PPM) header: magic, then
    whitespace-separated width/height with ``#`` comments allowed
    anywhere in the header — the full public spec for the header section.
    Like PIL, dimensions come from the header alone (a truncated pixel
    section fails at load, not open). Returns None when not netpbm."""
    magic = payload[:2].decode("ascii", "replace")
    if magic not in _PNM_MODE or (len(payload) > 2 and payload[2:3].isdigit()):
        return None
    dims: list[int] = []
    i = 2
    while len(dims) < 2 and i < len(payload):
        c = payload[i : i + 1]
        if c == b"#":  # comment runs to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < len(payload) and payload[j : j + 1].isdigit():
                j += 1
            dims.append(int(payload[i:j]))
            i = j
        else:
            return None
    if len(dims) < 2 or dims[0] <= 0 or dims[1] <= 0:
        return None
    return (dims[0], dims[1], _PNM_MODE[magic])


def _headers_decode(payload: bytes) -> tuple[int, int, str]:
    """No-PIL kernel: real header parse for BMP/netpbm payloads, byte-
    length fake (mode='STUB') for anything else."""
    for parse in (_parse_bmp, _parse_pnm):
        parsed = parse(payload)
        if parsed is not None:
            return parsed
    return _fake_decode(payload)


def _pil_decode(payload: bytes) -> tuple[int, int, str]:  # pragma: no cover
    """Real decode via PIL when it's installed. A payload PIL can't parse
    decodes to (0, 0, 'ERROR') instead of failing the stage — a corrupt
    image in a 100 TB corpus must not kill the job."""
    import io

    try:
        with _PIL_Image.open(io.BytesIO(payload)) as im:
            return (im.width, im.height, im.mode)
    except Exception:  # noqa: BLE001 — any parse failure is data, not a bug
        return (0, 0, "ERROR")


def with_decoded_metadata(
    df: DataFrame,
    content_col: str = "content",
    *,
    keep_content: bool = False,
) -> DataFrame:
    """Append decode metadata (width/height/mode) to a binary media table
    via an Arrow-batched mapInPandas stage."""
    passthrough = [
        f for f in df.schema.fields
        if keep_content or f.name != content_col
    ]
    out_schema = (
        ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in passthrough)
        + ", " + DECODE_SCHEMA
    )
    pass_names = [f.name for f in passthrough]

    def decode_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kernel = _pil_decode if _HAS_PIL else _headers_decode
        for pdf in batches:
            decoded = pdf[content_col].map(
                lambda b: kernel(bytes(b)) if b is not None else (0, 0, "NULL")
            )
            out = pdf[pass_names].copy()
            out["width"] = decoded.map(lambda t: t[0])
            out["height"] = decoded.map(lambda t: t[1])
            out["mode"] = decoded.map(lambda t: t[2])
            yield out

    return df.mapInPandas(decode_batches, schema=out_schema)


def frame_sample_plan(
    df: DataFrame,
    content_col: str = "content",
    *,
    every_nth: int = 10,
) -> DataFrame:
    """Video frame-sampling plumbing: explode a stub frame index per
    payload (byte-length-derived frame count) — the real decoder would
    emit one row per sampled frame with its own binary column."""
    from pyspark.sql import functions as F

    n_frames = (F.octet_length(F.col(content_col)) / 100 + 1).cast("int")
    return df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_nth))),
    ).drop(content_col)


FEATURE_DIM = 16


def extract_feature_counts(
    df: DataFrame,
    content_col: str = "content",
    *,
    id_col: str = "media_id",
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """(id, hist array<int>) per media row via Arrow-batched mapInPandas.

    STUB kernel: a ``dim``-bin raw byte histogram — INTEGER counts, so the
    kernel output is exactly comparable across engines (the DuckDB oracle
    recomputes the same counts; no float-rendering slack). A real
    deployment swaps in a vision/audio encoder emitting raw activations;
    the batch iteration and output schema are the contract."""
    out_schema = f"`{id_col}` bigint, hist array<int>"

    def feat_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for b in pdf[content_col]:
                if b is None:
                    feats.append([0] * dim)
                else:
                    arr = np.frombuffer(bytes(b), dtype=np.uint8) % dim
                    feats.append(np.bincount(arr, minlength=dim).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "hist": feats})

    return df.mapInPandas(feat_batches, schema=out_schema)


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    *,
    id_col: str = "media_id",
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """(id, features array<float>) — the normalized embedding face that
    feeds the similarity/ANN operators (``cosine_topk`` /
    ``embedding_near_dup_pairs``).

    The Python kernel emits raw integer counts
    (:func:`extract_feature_counts`); L1 normalization is a pure JVM
    expression on top — the UDF stays minimal and the float math happens
    in whole-stage codegen, not in Python."""
    from pyspark.sql import functions as F

    counts = extract_feature_counts(df, content_col, id_col=id_col, dim=dim)
    total = F.greatest(
        F.aggregate("hist", F.lit(0), lambda a, x: a + x), F.lit(1)
    ).cast("double")
    return counts.select(
        id_col,
        F.transform("hist", lambda h: (h.cast("double") / total))
        .cast("array<float>")
        .alias("features"),
    )


def resize_images(
    df: DataFrame,
    content_col: str = "content",
    *,
    width: int = 64,
    height: int = 64,
) -> DataFrame:
    """Binary→binary resize stage: same schema out as in, plus
    ``resized_width``/``resized_height`` metadata.

    STUB kernel: deterministic byte truncate/pad to ``width*height`` (a
    real deployment decodes, resamples, re-encodes). Payload stays binary
    through the stage — resize BEFORE any wide transform so the big bytes
    never shuffle."""
    fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{fields}, resized_width int, resized_height int"
    target = width * height

    def resize_batches(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out[content_col] = pdf[content_col].map(
                lambda b: None
                if b is None
                else (bytes(b)[:target]).ljust(target, b"\0")
            )
            out["resized_width"] = width
            out["resized_height"] = height
            yield out

    return df.mapInPandas(resize_batches, schema=out_schema)
