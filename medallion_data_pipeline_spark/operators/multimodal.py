"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for 100 TB image/audio/video pipelines: the media itself is an
opaque ``binary`` column (or an object-store path column); decode /
resize / frame-sample / feature-extract run as Arrow-batched
``mapInPandas`` stages so each Python worker touches a columnar batch,
never a row at a time. Partitioning stays on the metadata keys, so
re-shuffles never move payload bytes more than once.

The decode step needs media libraries (Pillow/av/librosa). Pillow is
try-imported: ``decoder="auto"`` resolves to the real PIL path when the
library is importable (corrupt payloads become feat=None marker rows)
and to ``decode_stub`` (a deterministic byte-level "decoder") when it
is not — as in this container. The Spark-side plumbing (schema, batch
iteration, UDF signatures) is identical on both paths and tested; the
oracle-gated query pins decoder="stub" so correctness never depends on
which libraries the host has.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of featurize_binary — fixed, so downstream plans compile
#: without running the Python stage.
FEATURE_SCHEMA = (
    "doc_id bigint, byte_len int, sha_hex string, feat array<double>"
)


def with_binary_payload(df: DataFrame, source_col: str, id_col: str = "doc_id") -> DataFrame:
    """Wrap a source column as an opaque binary payload + metadata —
    the ingest shape for media tables: (id, payload, media_type,
    byte_len)."""
    payload = F.encode(F.col(source_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(payload).alias("byte_len"),
    )


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode of one payload: a stable 4-dim
    feature from the payload's sha256, so the full pipeline (schema,
    batching, joins downstream) is exercised end to end — and so the
    SQL oracle can replay it. The registered ``multimodal_features``
    query pins ``decoder="stub"`` for exactly that reason; ``auto``
    picks :func:`decode_pil` when Pillow is importable.
    """
    import hashlib

    h = hashlib.sha256(payload).hexdigest()
    feat = [ord(h[i]) / 255.0 for i in range(4)]
    return {"sha_hex": h, "feat": feat}


def decode_pil(payload: bytes) -> dict:
    """Real image decode via Pillow: open -> RGB -> 16x16 thumbnail ->
    per-channel means + global std as the 4-dim feature. A payload
    that is not a parseable image yields ``feat=None`` — the
    corrupt-media marker row (real pipelines flag, never crash, on bad
    bytes). Raises ImportError when Pillow is absent; callers go
    through :func:`resolve_decoder`."""
    import hashlib
    import io

    import numpy as np
    from PIL import Image

    h = hashlib.sha256(payload).hexdigest()
    try:
        img = Image.open(io.BytesIO(payload)).convert("RGB")
    except Exception:
        return {"sha_hex": h, "feat": None}
    arr = np.asarray(img.resize((16, 16)), dtype="float64") / 255.0
    feat = [float(arr[..., 0].mean()), float(arr[..., 1].mean()),
            float(arr[..., 2].mean()), float(arr.std())]
    return {"sha_hex": h, "feat": feat}


def _pil_available() -> bool:
    import importlib.util

    return importlib.util.find_spec("PIL") is not None


def resolve_decoder(decoder: str = "auto"):
    """(name, fn) for a decoder choice: ``auto`` -> Pillow when
    importable, else the deterministic stub. Resolution happens ONCE,
    driver-side, at plan build — the chosen function is captured in the
    mapInPandas closure, so every executor batch uses the same path."""
    if decoder == "auto":
        decoder = "pil" if _pil_available() else "stub"
    if decoder == "pil":
        return "pil", decode_pil
    if decoder == "stub":
        return "stub", decode_stub
    raise ValueError(f"unknown decoder: {decoder!r}")


def resize_stub(payload: bytes, target: tuple[int, int] = (224, 224)) -> bytes:
    """Deterministic fake of an image resize.

    REAL IMPLEMENTATION: ``PIL.Image.open(...).resize(target)`` — lib
    absent here; the stub emits a stable payload of target-proportional
    size so downstream size accounting and repartitioning are real.
    """
    w, h = target
    out_len = max(1, min(len(payload), (w * h) // 64))
    reps = (out_len // max(len(payload), 1)) + 1
    return (payload * reps)[:out_len]


def frame_sample_stub(payload: bytes, every_n: int = 10, frame_size: int = 32) -> list[bytes]:
    """Deterministic fake of video frame sampling: treat the payload as
    fixed-size frames, keep every Nth (REAL IMPLEMENTATION: ``av``/
    ffmpeg keyframe iteration)."""
    frames = [payload[i:i + frame_size] for i in range(0, len(payload), frame_size)]
    return frames[::every_n]


RESIZED_SCHEMA = "doc_id bigint, resized binary, resized_len int"
FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame binary"
PHASH_SCHEMA = "doc_id bigint, phash bigint"

#: dHash grid geometry: 8 rows x 9 columns of samples -> 8x8 gradient
#: bits (one per horizontal neighbor comparison) = a 64-bit fingerprint.
DHASH_ROWS, DHASH_COLS = 8, 9


def dhash64(levels: list[int]) -> int:
    """The dHash gradient fingerprint over a 72-sample grid (Krawetz's
    difference hash, the standard perceptual image fingerprint): bit
    r*8+c is set iff grid[r][c] > grid[r][c+1]. Pure integer
    arithmetic; returns a SIGNED 64-bit int (bit 63 maps to the sign
    bit) so the value round-trips through Spark/parquet/DuckDB BIGINT
    unchanged. The locality property that makes it perceptual: a
    small change to the source flips only the few gradient bits whose
    grid cells sample it, while a different source re-rolls ~half the
    bits."""
    fp = 0
    for r in range(DHASH_ROWS):
        for c in range(DHASH_COLS - 1):
            if levels[r * DHASH_COLS + c] > levels[r * DHASH_COLS + c + 1]:
                fp |= 1 << (r * 8 + c)
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def dhash_stub(payload: bytes) -> int:
    """Deterministic fake of grayscale-resize -> dHash for hosts
    without an image decoder: the "grayscale grid" is the 72
    codepoints sampled evenly from the utf-8-decoded payload
    (position i samples character (i*(n-1))//71 — same locality as a
    real resize: each source position feeds at most a couple of grid
    cells). SQL-replayable (queries/llmops.py dedup_image_phash
    rebuilds the identical grid with unicode(substr(...))), and the
    1-byte-perturbation property test holds exactly as it would for
    a real image."""
    chars = payload.decode("utf-8")
    n = len(chars)
    k = DHASH_ROWS * DHASH_COLS
    if n == 0:
        levels = [0] * k
    else:
        levels = [ord(chars[(i * (n - 1)) // (k - 1)]) for i in range(k)]
    return dhash64(levels)


def dhash_pil(payload: bytes) -> int | None:
    """Real perceptual fingerprint via Pillow: grayscale -> 9x8
    resize -> horizontal-gradient bits. ``None`` for unparseable
    payloads (corrupt-media marker). Raises ImportError when Pillow
    is absent; callers go through the decoder-resolution idiom."""
    import io

    from PIL import Image

    try:
        img = Image.open(io.BytesIO(payload)).convert("L")
    except Exception:
        return None
    small = img.resize((DHASH_COLS, DHASH_ROWS))
    levels = list(small.getdata())  # row-major, 72 ints
    return dhash64(levels)


def phash_binary(media: DataFrame, id_col: str = "doc_id",
                 decoder: str = "auto") -> DataFrame:
    """(id, phash) perceptual fingerprints over the binary payload
    column — Arrow-batched mapInPandas, same plumbing contract as
    :func:`featurize_binary`. ``decoder="auto"`` resolves to the real
    Pillow dHash when importable, else the deterministic stub; the
    gated query pins "stub" so the oracle replays it. Downstream,
    near-duplicate candidates come from
    operators/dedup.py::fingerprint_hamming_pairs (pigeonhole block
    retrieval — never an all-pairs scan)."""
    if decoder == "auto":
        decoder = "pil" if _pil_available() else "stub"
    fn = dhash_pil if decoder == "pil" else dhash_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "phash": pd.array(
                    [None if p is None else fn(bytes(p))
                     for p in pdf["payload"]], dtype="Int64"),
            })

    return media.mapInPandas(run, schema=PHASH_SCHEMA)


def resize_pil(payload: bytes, target: tuple[int, int] = (224, 224)) -> bytes | None:
    """Real resize via Pillow, re-encoded as PNG bytes; ``None`` for
    unparseable payloads (corrupt-media marker)."""
    import io

    from PIL import Image

    try:
        img = Image.open(io.BytesIO(payload))
    except Exception:
        return None
    buf = io.BytesIO()
    img.resize(target).save(buf, format="PNG")
    return buf.getvalue()


def resize_batch(media: DataFrame, id_col: str = "doc_id",
                 target: tuple[int, int] = (224, 224),
                 decoder: str = "auto") -> DataFrame:
    """Arrow-batched resize over the payload column (mapInPandas).
    ``decoder`` as in :func:`featurize_binary`: auto -> Pillow when
    importable, else the deterministic stub."""
    if decoder == "auto":
        decoder = "pil" if _pil_available() else "stub"
    resize = resize_pil if decoder == "pil" else resize_stub

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [resize(bytes(p), target) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "resized": resized,
                "resized_len": [len(r) if r is not None else None
                                for r in resized],
            })

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, id_col: str = "doc_id",
                 every_n: int = 10) -> DataFrame:
    """Arrow-batched frame sampling: one payload row fans out to N frame
    rows (the explode-shaped media op; at scale repartition on doc_id
    AFTER sampling so frame rows spread evenly)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                for i, fr in enumerate(frame_sample_stub(bytes(payload), every_n)):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(fr)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)


def featurize_binary(media: DataFrame, id_col: str = "doc_id",
                     decoder: str = "auto") -> DataFrame:
    """Arrow-batched decode/featurize over the binary payload column via
    mapInPandas (SURVEY §2.9 U2-analogue for media; the slow path done
    right: per-batch Python, never per-row). ``decoder``: "auto" uses
    Pillow when importable (corrupt payloads -> feat=None marker rows),
    "stub" pins the deterministic sha-derived features the SQL oracle
    replays."""
    _, decode = resolve_decoder(decoder)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "byte_len": pdf["byte_len"].astype("int32").values,
                    "sha_hex": [d["sha_hex"] for d in decoded],
                    "feat": [d["feat"] for d in decoded],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
