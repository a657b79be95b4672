"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Convention: a media table carries ``content binary`` plus typed metadata
columns (``media_type string``, ``n_bytes bigint``, …). Decode /
feature-extraction / resize run as Arrow-batched ``mapInPandas`` stages —
the image/audio libraries are not in this container, so the actual decode
is STUBBED: when PIL is importable it is used; otherwise a clearly-marked
deterministic fake derives dimensions/features from the raw bytes. The
Spark-side plumbing — output schema, batch iteration, partition
preservation — is real and tested; swapping the stub for a real decoder
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
        kernel = _pil_decode if _HAS_PIL else _fake_decode
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
