"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed by Arrow-batched mapInPandas stages.

The decode step is STUBBED (no image/audio libraries in this runtime):
``decode_stub`` raises NotImplementedError unless ``fake=True``, in
which case it produces a deterministic hash-derived feature vector with
the exact schema/batch shape a real decoder (PIL/libav) would emit —
so the Spark-side plumbing (schema, partitioning, UDF signature, Arrow
batch flow) is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

ASSET_SCHEMA = ("asset_id long, kind string, payload binary, "
                "width int, height int, duration_ms int")

FEATURE_SCHEMA = ("asset_id long, kind string, feat array<float>, "
                  "feat_dim int, decode_ok boolean")


def synth_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake binary assets (png/wav/mp4 kinds)."""
    kinds = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"))
    payload = F.encode(
        F.format_string("ASSET-%d-" + str(seed), F.col("id")), "UTF-8")
    return (spark.range(n).select(
        F.col("id").alias("asset_id"),
        kinds.alias("kind"),
        payload.alias("payload"),
        (F.pmod(F.col("id"), F.lit(64)) * 16 + 16).cast("int").alias("width"),
        (F.pmod(F.col("id"), F.lit(48)) * 16 + 16).cast("int").alias("height"),
        (F.pmod(F.col("id"), F.lit(1000)) * 33).cast("int")
        .alias("duration_ms")))


def extract_features(assets: DataFrame, feat_dim: int = 8,
                     fake: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas. With ``fake=True`` the
    'decoder' derives a deterministic float vector from sha256(payload)
    — the real decoder drops in by replacing _decode only."""

    def _decode(payload: bytes, kind: str) -> np.ndarray:
        if not fake:
            raise NotImplementedError(
                "real image/audio decode requires PIL/libav — not in this "
                "runtime; swap this function when deploying")
        if payload is None or len(payload) == 0:
            # the stand-in for a real decoder's corrupt-input error
            raise ValueError("undecodable payload")
        h = hashlib.sha256(payload).digest()
        raw = np.frombuffer(h[: feat_dim * 4], dtype=np.uint32)
        return (raw.astype(np.float32) / np.float32(2 ** 32))

    def batches(it):
        for pdf in it:
            feats, oks = [], []
            for p, k in zip(pdf["payload"], pdf["kind"]):
                # ValueError = corrupt INPUT -> row flagged, job
                # continues; NotImplementedError = missing runtime
                # CAPABILITY -> propagate, the job must fail loudly
                try:
                    feats.append(_decode(p, k).tolist())
                    oks.append(True)
                except ValueError:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "feat": feats,
                "feat_dim": feat_dim,
                "decode_ok": oks,
            })

    return (assets.repartition("kind")     # co-locate homogeneous decode
            .mapInPandas(batches, FEATURE_SCHEMA))


RESIZE_SCHEMA = ("asset_id long, kind string, out_width int, "
                 "out_height int, payload_resized binary, decode_ok boolean")


def resize_assets(assets: DataFrame, max_w: int = 256, max_h: int = 256,
                  fake: bool = True) -> DataFrame:
    """Aspect-preserving fit-in-box resize. The TARGET GEOMETRY is pure
    column algebra (scale = min(max_w/w, max_h/h, 1), floor, min 1px —
    SQL-verifiable); the pixel work runs in mapInPandas with the same
    stub contract as extract_features: ``fake=True`` emits a
    deterministic sha256-of-(payload, geometry) stand-in payload with
    the real schema/batch shape, a real decoder drops in by replacing
    ``_resize`` only."""
    scale = F.least(F.lit(float(max_w)) / F.col("width"),
                    F.lit(float(max_h)) / F.col("height"),
                    F.lit(1.0))
    sized = (assets
             .withColumn("out_width",
                         F.greatest(F.floor(F.col("width") * scale),
                                    F.lit(1)).cast("int"))
             .withColumn("out_height",
                         F.greatest(F.floor(F.col("height") * scale),
                                    F.lit(1)).cast("int")))

    def _resize(payload: bytes, w: int, h: int) -> bytes:
        if not fake:
            raise NotImplementedError(
                "real pixel resize requires PIL — not in this runtime; "
                "swap this function when deploying")
        if payload is None or len(payload) == 0:
            raise ValueError("undecodable payload")
        return hashlib.sha256(payload + f"@{w}x{h}".encode()).digest()

    def batches(it):
        for pdf in it:
            outs, oks = [], []
            for p, w, h in zip(pdf["payload"], pdf["out_width"],
                               pdf["out_height"]):
                try:
                    outs.append(_resize(p, w, h))
                    oks.append(True)
                except ValueError:
                    outs.append(None)
                    oks.append(False)
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "kind": pdf["kind"],
                "out_width": pdf["out_width"],
                "out_height": pdf["out_height"],
                "payload_resized": outs,
                "decode_ok": oks,
            })

    return sized.repartition("kind").mapInPandas(batches, RESIZE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan (timestamps to decode) — pure column
    algebra; the decode itself goes through extract_features."""
    return (assets.where(F.col("kind") == "video/mp4")
            .select("asset_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))).alias("frame_ms")))
