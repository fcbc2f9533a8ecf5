"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride in the pages table as opaque `binary` columns
(here: the `html` payload stands in). The engine's job at 100 TB is the
Spark-side plumbing — schema, Arrow batch shape, partitioning, UDF
signatures — not the codecs: real decoders (PIL/ffmpeg/librosa) are not
in this container, so `decode_real` raises NotImplementedError and
`decode_stub_meta` substitutes a deterministic md5-derived fake decode
whose arithmetic the DuckDB oracle reproduces exactly (so even the stub
is correctness-gated, not just shape-gated).

Scale notes: payload bytes never leave the executor — metadata extraction
is a mapInPandas pass emitting small typed rows; batches are bounded by
spark.sql.execution.arrow.maxRecordsPerBatch so a batch of 65,536 payload
rows streams through Arrow without materializing the whole partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "url string, n_bytes long, width long, height long, n_frames long, "
    "feat double"
)


def decode_real(payload: bytes) -> dict:
    """Placeholder for a real image/audio decode (PIL/ffmpeg). The
    container ships no codec libraries — deliberately stubbed."""
    raise NotImplementedError(
        "real multimodal decode requires image/audio codecs not present "
        "in this environment; use decode_stub_meta (deterministic fake)")


def _stub_fields(digest_hex: str) -> tuple[int, int, int, float]:
    """Deterministic fake decode: dimensions/frames/feature derived from
    the payload's md5. Mirrors the oracle SQL in queries/textpipe.py."""
    w = 16 + int(digest_hex[0:2], 16)
    h = 16 + int(digest_hex[2:4], 16)
    frames = 1 + int(digest_hex[4:6], 16) % 8
    # plain IEEE division, no rounding — bit-identical to the oracle SQL
    feat = int(digest_hex[6:10], 16) / 65535.0
    return w, h, frames, feat


def decode_stub_meta(pages: DataFrame, payload_col: str = "html") -> DataFrame:
    """pages → (url, n_bytes, width, height, n_frames, feat) via
    mapInPandas over the binary payload column."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            rows = {
                "url": pdf["url"],
                "n_bytes": payloads.map(len).astype("int64"),
            }
            metas = [
                _stub_fields(hashlib.md5(p).hexdigest()) for p in payloads
            ]
            rows["width"] = pd.Series([m[0] for m in metas], dtype="int64")
            rows["height"] = pd.Series([m[1] for m in metas], dtype="int64")
            rows["n_frames"] = pd.Series([m[2] for m in metas], dtype="int64")
            rows["feat"] = pd.Series([m[3] for m in metas], dtype="float64")
            yield pd.DataFrame(rows)

    return pages.select("url", payload_col).mapInPandas(
        _decode, schema=DECODE_SCHEMA)


def resize_stub(pages: DataFrame, out_w: int, out_h: int,
                payload_col: str = "html") -> DataFrame:
    """Binary→binary resize plumbing: the UDF consumes the payload column
    and emits a NEW payload of the target dimensions plus its metadata —
    the exact signature a real thumbnailer has. The stub's output bytes
    are the md5-hex of the input repeated to (out_w·out_h)/64 bytes
    (deterministic; a real PIL resize drops in without touching the
    plan). Output digest + sizes are oracle-checked."""
    n_bytes = (out_w * out_h) // 64
    reps = (n_bytes + 31) // 32

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for p in pdf[payload_col]:
                hexd = hashlib.md5(p).hexdigest()
                out_payloads.append((hexd * reps)[:n_bytes]
                                    .encode("ascii"))
            yield pd.DataFrame({
                "url": pdf["url"],
                "width": pd.Series([out_w] * len(pdf), dtype="int64"),
                "height": pd.Series([out_h] * len(pdf), dtype="int64"),
                "n_bytes": pd.Series([n_bytes] * len(pdf), dtype="int64"),
                "resized_md5": [hashlib.md5(b).hexdigest()
                                for b in out_payloads],
            })

    return pages.select("url", payload_col).mapInPandas(
        _resize,
        "url string, width long, height long, n_bytes long,"
        " resized_md5 string")


def frame_sample_stub(pages: DataFrame, step: int = 2,
                      payload_col: str = "html") -> DataFrame:
    """One-to-many frame sampling plumbing (video stand-in): each payload
    fans out to its sampled frame indices (every ``step``-th of the
    stub-decoded n_frames) with a per-frame feature — the mapInPandas
    shape of a real ffmpeg frame extractor."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, idxs, feats = [], [], []
            for url, p in zip(pdf["url"], pdf[payload_col]):
                hexd = hashlib.md5(p).hexdigest()
                n_frames = 1 + int(hexd[4:6], 16) % 8
                base = int(hexd[6:10], 16)
                for f in range(0, n_frames, step):
                    urls.append(url)
                    idxs.append(f)
                    feats.append(((base + 37 * f) % 1000) / 1000.0)
            yield pd.DataFrame({
                "url": pd.Series(urls, dtype="object"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_feat": pd.Series(feats, dtype="float64"),
            })

    return pages.select("url", payload_col).mapInPandas(
        _sample, "url string, frame_idx long, frame_feat double")


def payload_meta(pages: DataFrame, payload_col: str = "html") -> DataFrame:
    """Pure-Catalyst payload metadata: byte length, content digest, and a
    magic-prefix format sniff — the cheap pass run before any decode."""
    return pages.select(
        "url",
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("content_md5"),
        F.when(
            F.decode(F.col(payload_col), "utf-8").startswith("<html>"),
            F.lit("text/html"),
        ).otherwise(F.lit("application/octet-stream")).alias("format"),
    )
