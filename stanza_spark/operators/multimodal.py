"""Multimodal-column plumbing: treat image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` (schema, batching and partitioning are real; the actual
codec step is stubbed — image/audio libraries are not in this container).

`decode_meta` extracts deterministic metadata (byte length, md5, a fake
width/height derived from the digest) so the Spark-side plumbing is fully
testable; `decode_image` is the clearly-marked stub that a real deployment
replaces with PIL/ffmpeg inside the same UDF shape.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

META_SCHEMA = ("doc_id bigint, n_bytes bigint, digest string, "
               "fake_width int, fake_height int")


def decode_image(payload: bytes):
    """STUB: real deployments decode here (PIL.Image.open(BytesIO(payload))).
    The container has no imaging libs, so decoding is not implemented."""
    raise NotImplementedError(
        "image decoding is stubbed in this environment; metadata extraction "
        "(decode_meta) exercises the real Spark plumbing")


def _meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        digests = [hashlib.md5(b).hexdigest() for b in pdf["payload"]]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].astype("int64"),
            "n_bytes": [len(b) for b in pdf["payload"]],
            "digest": digests,
            # deterministic fake dimensions in lieu of a real codec
            "fake_width": [int(d[:4], 16) % 1920 + 1 for d in digests],
            "fake_height": [int(d[4:8], 16) % 1080 + 1 for d in digests],
        })


def binary_payloads(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Fake a multimodal table: (doc_id, payload binary) — utf-8 bytes of
    the text stand in for an encoded image."""
    return df.select(F.col(id_col).alias("doc_id"),
                     F.encode(F.col(text_col), "UTF-8").alias("payload"))


def decode_meta(payloads: DataFrame) -> DataFrame:
    """binary payload -> typed metadata via Arrow-batched mapInPandas."""
    return payloads.mapInPandas(_meta_batches, schema=META_SCHEMA)
