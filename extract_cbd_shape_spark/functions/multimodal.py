"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched pandas UDFs.

The reference has no media path (it is a pure RDF library); these are
the training-data-pipeline operators a 100 TB corpus needs. The
Spark-side plumbing — schema, mapInPandas batch shape, partitioning,
explode semantics — is real and tested. The *codec* layer is stubbed:
real decoders (PIL / libav) are not in this container, so decoding is
gated behind an import-try that raises ``NotImplementedError``, and a
deterministic fake codec (payload = repeated md5-hex of the media id,
dimensions carried in ``meta``) stands in so every operator is
exercised end-to-end and oracle-checkable in SQL.

Design for scale:
* payloads never leave the executor: mapInPandas streams Arrow batches,
  no collect, no driver round-trip;
* frame sampling explodes video rows WITHOUT shuffling — it is a
  per-partition flatMap, so a 100 TB corpus fans out in place;
* feature extraction emits fixed-width ``array<float>`` columns that
  feed the similarity operators (cosine_topk / lsh_topk / ivf_topk)
  directly.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_META = (
    "struct<width:int, height:int, sample_rate:int, duration_ms:int, codec:string>"
)
MEDIA_SCHEMA = f"media_id bigint, kind string, payload binary, meta {MEDIA_META}"

_KINDS = ["image", "audio", "video"]
FRAME_STEP_MS = 500


def real_decode(payload: bytes, codec: str):  # pragma: no cover - stub
    """Real codec entry point. The container has no PIL/libav; swap this
    for an actual decoder in production."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "real media decoding requires PIL/libav, not present in this "
            "container; the deterministic fake codec is used instead"
        )
    raise NotImplementedError("real decode not wired in this sandbox")


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from documents.parquet.

    payload = UTF-8 bytes of md5(doc_id) repeated (1 + doc_id % 4)
    times; kind cycles image/audio/video; meta dims derived from
    doc_id. Pure column ops — mirrors 1:1 in DuckDB SQL."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    k = F.col("doc_id") % 3
    kind = F.element_at(F.array(*[F.lit(x) for x in _KINDS]), (k + 1).cast("int"))
    meta = F.struct(
        F.when(k != 1, (16 + F.col("doc_id") % 64)).cast("int").alias("width"),
        F.when(k != 1, (16 + F.col("doc_id") % 48)).cast("int").alias("height"),
        F.when(k == 1, (8000 + (F.col("doc_id") % 4) * 4000))
        .cast("int")
        .alias("sample_rate"),
        F.when(k != 0, (1000 + (F.col("doc_id") % 10) * 500))
        .cast("int")
        .alias("duration_ms"),
        F.concat(F.lit("fake-"), kind).alias("codec"),
    )
    payload = F.encode(
        F.repeat(F.md5(F.col("doc_id").cast("string")),
                 (1 + F.col("doc_id") % 4).cast("int")),
        "UTF-8",
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


_DECODE_SCHEMA = (
    "media_id bigint, kind string, width int, height int, "
    "payload_len int, checksum string"
)


def decode_media(media: DataFrame) -> DataFrame:
    """Decode step (stub codec): per-row payload inspection in Arrow
    batches — length, md5 checksum, dims from meta. Real decoders slot
    into the same batch loop (see ``real_decode``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "width": pd.array(
                        [m["width"] for m in pdf["meta"]], dtype="Int32"
                    ),
                    "height": pd.array(
                        [m["height"] for m in pdf["meta"]], dtype="Int32"
                    ),
                    "payload_len": [len(p) for p in payloads],
                    "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
                }
            )

    return media.mapInPandas(run, _DECODE_SCHEMA)


def resize_media(media: DataFrame, max_w: int = 32, max_h: int = 32) -> DataFrame:
    """Resize plumbing (stub codec): clamps meta dims and truncates the
    payload proportionally to the area ratio — a deterministic stand-in
    for a real resampler with identical dataflow shape (binary in,
    binary out, no shuffle)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, widths, heights = [], [], []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                w, h = m["width"], m["height"]
                if w is None or pd.isna(w):
                    out_payload.append(bytes(p))
                    widths.append(None)
                    heights.append(None)
                    continue
                w, h = int(w), int(h)
                nw, nh = min(w, max_w), min(h, max_h)
                raw = bytes(p)
                keep = max(1, int(len(raw) * (nw * nh) / (w * h)))
                out_payload.append(raw[:keep])
                widths.append(nw)
                heights.append(nh)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "payload": out_payload,
                }
            )

    return media.mapInPandas(
        run,
        "media_id bigint, kind string, width int, height int, payload binary",
    )


def frame_sample(media: DataFrame, step_ms: int = FRAME_STEP_MS) -> DataFrame:
    """Sample video frames every ``step_ms``: per-partition explode
    (flatMap, no shuffle). Frame payload is a stub slice keyed by
    (media_id, ts_ms); a real pipeline seeks the container stream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, kind, p, m in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                dur = m["duration_ms"]
                if kind != "video" or dur is None or pd.isna(dur):
                    continue
                raw = bytes(p)
                for i, ts in enumerate(range(0, int(dur), step_ms)):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(ts)
                    frames.append(raw[i % max(len(raw), 1):][:16])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss,
                 "frame": frames}
            )

    return media.mapInPandas(
        run, "media_id bigint, frame_idx int, ts_ms int, frame binary"
    )


def media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Fixed-width float features from payload bytes (stub: byte value
    at position j). Output array<float> plugs into cosine_topk /
    ivf_topk. Vectorized: one Python call per Arrow batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                raw = bytes(p)
                feats.append(
                    [float(raw[j % len(raw)]) if raw else 0.0 for j in range(dim)]
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].values, "feature": feats}
            )

    return media.mapInPandas(run, "media_id bigint, feature array<float>")
