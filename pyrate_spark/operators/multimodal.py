"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed by Arrow-batched mapInPandas stages.

The decode step is CAPABILITY-DETECTED (r4; real-path closed r7): each
mode accepts ``fake=True`` (deterministic sha256-derived stand-in, the
default — what the oracles gate), ``fake=False`` (REAL image decode:
PIL when the runtime has it, else the vendored pure-stdlib PNG codec
in kernels/pngcodec.py — always available, so the real image path now
runs end-to-end on every runtime), or ``fake="auto"``. ``"auto"`` is
resolved ONCE on the DRIVER (r5, per advisor) to a concrete tier —
``"real-images"`` (PIL-grade) when the driver has PIL, else
``"real-images-mini"`` (vendored codec) — and the decision ships to
every executor in the serialized task closure, so one job emits ONE
decode implementation everywhere: a worker that cannot honor a
PIL-grade decision raises NotImplementedError (loud capability
mismatch) rather than silently downgrading, and the vendored tier is
honorable by construction (stdlib only). Audio/video decode needs
libav and stays stub under "auto" / NotImplementedError under
``fake=False`` in every runtime this repo targets. The Spark-side
plumbing (schema, partitioning, UDF signature, Arrow batch flow) is
identical across all modes and tested end-to-end.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def _pil_image():
    """PIL capability probe: the PIL Image module, or None. For
    ``fake="auto"`` this runs ONCE on the driver (the decision then
    ships in the task closure); inside the UDF it only re-imports the
    module when the already-made decision requires it."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def _resolve_auto(fake):
    """Driver-side resolution of ``fake="auto"`` to a concrete decode
    TIER: ``"real-images"`` (PIL importable here) or
    ``"real-images-mini"`` (the vendored pure-stdlib PNG codec — always
    available, so since r7 "auto" never silently stubs images).
    Resolving on the driver keeps one job on one implementation across
    a heterogeneous cluster; a worker missing PIL under a PIL-grade
    decision fails loudly in the UDF instead of downgrading its rows,
    and the mini tier is honorable everywhere by construction."""
    if fake == "auto":
        return ("real-images" if _pil_image() is not None
                else "real-images-mini")
    return fake


_REAL_TIERS = ("real-images", "real-images-mini")


def _image_codec(fake, Image):
    """The Image-module-like codec for a resolved real-decode decision:
    PIL under a PIL-grade decision (raising loudly when this worker
    lacks it), the vendored MiniImage under the mini tier, and
    best-available under ``fake=False``."""
    from pyrate_spark.kernels.pngcodec import MiniImage
    if fake == "real-images":
        if Image is None:
            raise NotImplementedError(
                "job resolved to PIL-grade image decode but PIL is "
                "missing on this worker — capability mismatch")
        return Image
    if fake == "real-images-mini":
        return MiniImage
    return Image if Image is not None else MiniImage   # fake=False


def real_image_features(payload: bytes, feat_dim: int, Image) -> np.ndarray:
    """Real pixel path: decode, grayscale, resize to (feat_dim,
    feat_dim), features = row means / 255. ``Image`` is any
    PIL.Image-module-compatible codec (PIL itself or the vendored
    kernels.pngcodec.MiniImage facade)."""
    img = Image.open(io.BytesIO(payload)).convert("L")
    img = img.resize((feat_dim, feat_dim))
    arr = np.asarray(img, dtype=np.float32)
    return arr.mean(axis=1) / np.float32(255.0)


def stub_features(payload: bytes, feat_dim: int) -> np.ndarray:
    """Deterministic sha256-derived stand-in feature vector (the
    runtime-capability stub; exact real-decoder schema/shape). Counter-
    chained digests extend to ANY feat_dim — a 32-byte digest covers
    only 8 uint32 lanes, and silently truncating would make stub and
    real workers emit different dimensionality on the same job."""
    need = feat_dim * 4
    h = hashlib.sha256(payload).digest()   # block 0: the oracle-replayed
    counter = 1                            # derivation, unchanged
    while len(h) < need:
        h += hashlib.sha256(payload + counter.to_bytes(4, "big")).digest()
        counter += 1
    raw = np.frombuffer(h[:need], dtype=np.uint32)
    return raw.astype(np.float32) / np.float32(2 ** 32)

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
                     fake: bool | str = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas.

    fake=True  -> sha256 stand-in (deterministic, oracle-gated);
    fake="auto"-> resolved ONCE on the driver to a concrete tier:
                  PIL-grade image decode when the driver has PIL, the
                  vendored PNG codec otherwise (real pixels either
                  way, same schema); the decision ships in the task
                  closure, so a worker lacking PIL under a PIL-grade
                  decision raises instead of mixing implementations;
    fake=False -> require real decode: PIL if present, else the
                  vendored PNG codec for images; NotImplementedError
                  for audio/video (libav is out of every targeted
                  runtime).
    """
    if fake not in (True, False, "auto"):
        raise ValueError(f"fake must be True, False or 'auto', got {fake!r}")
    fake = _resolve_auto(fake)

    def _decode(payload: bytes, kind: str, Image) -> np.ndarray:
        if payload is None or len(payload) == 0:
            # the stand-in for a real decoder's corrupt-input error
            raise ValueError("undecodable payload")
        use_real = (fake is False
                    or (fake in _REAL_TIERS
                        and kind.startswith("image/")))
        if use_real:
            if not kind.startswith("image/"):
                raise NotImplementedError(
                    f"real decode for {kind} requires libav — not in "
                    "this runtime")
            codec = _image_codec(fake, Image)   # may raise (loud)
            try:
                return real_image_features(payload, feat_dim, codec)
            except NotImplementedError:
                raise
            except Exception as exc:   # corrupt input, not capability
                raise ValueError(f"undecodable payload: {exc}") from None
        return stub_features(payload, feat_dim)

    def batches(it):
        Image = _pil_image() if fake is not True else None
        for pdf in it:
            feats, oks = [], []
            for p, k in zip(pdf["payload"], pdf["kind"]):
                # ValueError = corrupt INPUT -> row flagged, job
                # continues; NotImplementedError = missing runtime
                # CAPABILITY -> propagate, the job must fail loudly
                try:
                    feats.append(_decode(p, k, Image).tolist())
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
                  fake: bool | str = True) -> DataFrame:
    """Aspect-preserving fit-in-box resize. The TARGET GEOMETRY is pure
    column algebra (scale = min(max_w/w, max_h/h, 1), floor, min 1px —
    SQL-verifiable); the pixel work runs in mapInPandas with the same
    fake=True/False/"auto" contract as ``extract_features`` ("auto" =
    driver-resolved tier: PIL resize when the driver has PIL, the
    vendored nearest-neighbor PNG codec otherwise — real pixels either
    way, same schema)."""
    if fake not in (True, False, "auto"):
        raise ValueError(f"fake must be True, False or 'auto', got {fake!r}")
    fake = _resolve_auto(fake)
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

    def _resize(payload: bytes, kind: str, w: int, h: int, Image) -> bytes:
        if payload is None or len(payload) == 0:
            raise ValueError("undecodable payload")
        use_real = (fake is False
                    or (fake in _REAL_TIERS
                        and kind.startswith("image/")))
        if use_real:
            if not kind.startswith("image/"):
                raise NotImplementedError(
                    f"real pixel resize for {kind} requires libav — "
                    "not in this runtime")
            codec = _image_codec(fake, Image)   # may raise (loud)
            try:
                img = codec.open(io.BytesIO(payload))
                buf = io.BytesIO()
                img.resize((int(w), int(h))).save(buf, format="PNG")
                return buf.getvalue()
            except NotImplementedError:
                raise
            except Exception as exc:
                raise ValueError(f"undecodable payload: {exc}") from None
        return hashlib.sha256(payload + f"@{w}x{h}".encode()).digest()

    def batches(it):
        Image = _pil_image() if fake is not True else None
        for pdf in it:
            outs, oks = [], []
            for p, k, w, h in zip(pdf["payload"], pdf["kind"],
                                  pdf["out_width"], pdf["out_height"]):
                try:
                    outs.append(_resize(p, k, w, h, Image))
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
