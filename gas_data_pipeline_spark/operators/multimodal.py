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
