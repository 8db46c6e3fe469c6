"""Multimodal column operators (SURVEY §2.11 X4): opaque binary
payloads + typed metadata in ordinary DataFrame columns, processed by
Arrow-batched pandas UDFs over ``mapInPandas``.

The DECODE step is a pluggable seam: every operator that needs pixels
takes a ``codec`` callable (``bytes -> 2-D numpy array``) and defaults
to :func:`fake_codec` — a deterministic stand-in (payload bytes ARE the
pixels) because this container ships no image/audio libraries. A
production deployment passes a PIL/ffmpeg-backed callable and NOTHING
else changes: schema, batch iteration, partition-preserving plumbing
are identical and tested either way (tests/test_northstar.py swaps a
custom codec through the seam).

All executor-side callables are defined inside factories/closures so
cloudpickle ships them BY VALUE — executors never need this package on
their PYTHONPATH (required when an external driver imports the engine
from an arbitrary cwd).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# bytes in, 2-D numpy pixel array out. `Any` because numpy types stay
# out of module-level annotations (executor closures import it inside).
Codec = Callable[[bytes], Any]

FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, first_byte int, crc bigint"
DECODE_SCHEMA = "doc_id bigint, height int, width int, pixels array<double>"
RESIZE_SCHEMA = DECODE_SCHEMA


def fake_codec() -> Codec:
    """Deterministic stand-in decode: the payload's bytes are folded
    into the smallest square 1-channel image that holds them. Returned
    as a nested function so cloudpickle ships it by value into
    executors."""

    def decode(raw: bytes):
        import numpy as np

        buf = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        if buf.size == 0:
            buf = np.zeros(1)
        side = int(np.ceil(np.sqrt(buf.size)))
        return np.resize(buf, (side, side))

    return decode


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stand-in for real media ingestion: content as a BinaryType column
    plus a typed metadata struct — the multimodal storage layout
    (binary + metadata travels with the row; partition by size class
    at scale so huge blobs don't skew tasks)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(text_col)).cast("bigint").alias("n_bytes"),
        ).alias("media_meta"),
    )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas`` — the real distributed plumbing (batch iterator in,
    batch iterator out, new schema). Features are raw-payload stats
    (size / first byte / crc32) — no decode needed, so no codec seam
    here; decoded-pixel features go through :func:`decode_media`.

    The closure is deliberately self-contained (stdlib imports inside,
    no references to this module's globals): cloudpickle ships it by
    value, so executors never need ``gas_data_pipeline_spark`` on their
    PYTHONPATH — required when an external driver imports the engine
    from an arbitrary cwd."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "first_byte": pdf["payload"].map(
                        lambda b: b[0] if len(b) else -1
                    ),
                    "crc": pdf["payload"].map(
                        lambda b: zlib.crc32(b) & 0xFFFFFFFF
                    ),
                }
            )
            yield out

    return binary_df.mapInPandas(featurize, schema=FEATURE_SCHEMA)


def decode_media(binary_df: DataFrame, codec: Codec | None = None) -> DataFrame:
    """X4 decode: binary payload -> native-size pixel grid through the
    pluggable codec seam (default :func:`fake_codec`). One output row
    per input row (doc_id, height, width, pixels) — narrow, scan-speed,
    no shuffle. Swap in a real decoder (e.g. PIL.Image.open ->
    np.asarray) and the Spark contract is unchanged."""
    dec = codec if codec is not None else fake_codec()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd

        for pdf in batches:
            ids, hs, ws, px = [], [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                img = dec(bytes(raw))
                ids.append(doc_id)
                hs.append(int(img.shape[0]))
                ws.append(int(img.shape[1]))
                px.append([float(v) for v in img.ravel()])
            yield pd.DataFrame(
                {"doc_id": ids, "height": hs, "width": ws, "pixels": px}
            )

    return binary_df.mapInPandas(run, schema=DECODE_SCHEMA)


def resize_media(
    binary_df: DataFrame,
    height: int = 8,
    width: int = 8,
    codec: Codec | None = None,
) -> DataFrame:
    """Resize (X4): decode via the codec seam, then block-mean pool to
    a fixed (height x width) grid — the exact batch shape a real image
    resize has (variable-size binary in, fixed-size tensor out).
    Output rows stay 1:1 with inputs — no shuffle, scan-speed narrow
    op."""
    h, w = int(height), int(width)
    dec = codec if codec is not None else fake_codec()

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            pixels = []
            for raw in pdf["payload"]:
                img = np.asarray(dec(bytes(raw)), dtype=np.float64)
                h0, w0 = img.shape
                # Block-mean pooling to the target grid.
                ys = (np.arange(h + 1) * h0) // h
                xs = (np.arange(w + 1) * w0) // w
                out = np.empty((h, w))
                for i in range(h):
                    rows = img[ys[i]: max(ys[i + 1], ys[i] + 1)]
                    for j in range(w):
                        block = rows[:, xs[j]: max(xs[j + 1], xs[j] + 1)]
                        out[i, j] = float(block.mean())
                pixels.append(out.ravel().tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "height": h,
                    "width": w,
                    "pixels": pixels,
                }
            )

    return binary_df.mapInPandas(resize, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = (
    "doc_id bigint, frame_idx bigint, n_bytes bigint, frame_sha string"
)


def sample_frames(
    binary_df: DataFrame, frame_size: int = 64, every: int = 4
) -> DataFrame:
    """Frame-sampling plumbing (X4): payload treated as a container of
    fixed-size frames; emit every ``every``-th frame as its own row —
    the ROW-EXPANDING mapInPandas shape (1 input -> N output rows,
    output batch larger than input batch) a real video sampler has,
    with the demux faked as fixed-width slicing. Expansion happens
    map-side; at scale follow with repartition if downstream work is
    per-frame heavy."""
    fs, ev = int(frame_size), int(every)

    def frames(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, idxs, sizes, shas = [], [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(raw)
                n_frames = max((len(raw) + fs - 1) // fs, 1)
                for k in range(0, n_frames, ev):
                    chunk = raw[k * fs: (k + 1) * fs]
                    ids.append(doc_id)
                    idxs.append(k)
                    sizes.append(len(chunk))
                    # sha-256 (not crc32): same per-frame checksum role,
                    # but portable — every engine (and the DuckDB
                    # oracle) can recompute it.
                    shas.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "n_bytes": sizes,
                 "frame_sha": shas}
            )

    return binary_df.mapInPandas(frames, schema=FRAME_SCHEMA)
