"""Multimodal column operators (SURVEY §2.11 X4): opaque binary
payloads + typed metadata in ordinary DataFrame columns, processed by
Arrow-batched pandas UDFs over ``mapInPandas``.

The decode step (image/audio libs) is STUBBED — the container has no
codecs — but everything Spark-side is real and tested: schema, batch
iteration, partition-preserving plumbing, deterministic fake features.
Swap ``_decode_stub`` for PIL/torchaudio in production; nothing else
changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, first_byte int, crc bigint"


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
    batch iterator out, new schema). Features here are deterministic
    stand-ins (size / first byte / crc32) for real embeddings.

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


def decode_media(binary_df: DataFrame, codec: str = "image"):
    """Real decode entry point — STUB. The Spark-side contract (binary
    in, array<float> features out via mapInPandas) is what the engine
    guarantees; the codec body requires PIL/torchaudio, absent here."""
    raise NotImplementedError(
        f"media decode ({codec}) requires codec libraries not present in "
        "this environment; use extract_features for the plumbing-verified "
        "deterministic path"
    )


RESIZE_SCHEMA = "doc_id bigint, height int, width int, pixels array<double>"


def resize_media(
    binary_df: DataFrame, height: int = 8, width: int = 8
) -> DataFrame:
    """Resize plumbing (X4): payload -> fixed (height x width) pixel
    grid via block-mean pooling — the exact batch shape a real image
    resize has (variable-size binary in, fixed-size tensor out), with
    the DECODE faked deterministically (bytes ARE the pixels) because
    the container has no codecs. Swap the two marked lines for
    PIL.Image.open/resize and the schema, partitioning and Arrow
    batching are already production-shaped. Output rows stay 1:1 with
    inputs — no shuffle, scan-speed narrow op."""
    h, w = int(height), int(width)

    def resize(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            pixels = []
            for raw in pdf["payload"]:
                # FAKE DECODE: bytes -> 1-channel image (replace with a
                # real codec in production; everything else stands).
                buf = np.frombuffer(bytes(raw), dtype=np.uint8).astype(np.float64)
                if buf.size == 0:
                    buf = np.zeros(1)
                side = int(np.ceil(np.sqrt(buf.size)))
                img = np.resize(buf, (side, side))
                # Block-mean pooling to the target grid.
                ys = (np.arange(h + 1) * side) // h
                xs = (np.arange(w + 1) * side) // w
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


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, n_bytes bigint, crc bigint"


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
        import zlib

        import pandas as pd

        for pdf in batches:
            ids, idxs, sizes, crcs = [], [], [], []
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(raw)
                n_frames = max((len(raw) + fs - 1) // fs, 1)
                for k in range(0, n_frames, ev):
                    chunk = raw[k * fs: (k + 1) * fs]
                    ids.append(doc_id)
                    idxs.append(k)
                    sizes.append(len(chunk))
                    crcs.append(zlib.crc32(chunk) & 0xFFFFFFFF)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "n_bytes": sizes, "crc": crcs}
            )

    return binary_df.mapInPandas(frames, schema=FRAME_SCHEMA)
