"""Multimodal plumbing: media struct schema, Arrow mapInPandas feature
extraction, frame sampling, decode stub behavior."""

import pytest

from database_anonymiser_minimiser_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media_df(spark, sf_dir):
    from database_anonymiser_minimiser_spark.queries import load

    return M.attach_media(load(spark, sf_dir, "documents").limit(20))


def test_media_struct_schema(media_df):
    f = dict(zip(media_df.schema.names, media_df.schema.fields))["media"]
    dt = f.dataType
    assert dt.simpleString() == (
        "struct<data:binary,meta:struct<format:string,n_bytes:bigint,checksum:string>>"
    )


def test_metadata_matches_payload(media_df):
    rows = media_df.select("doc_id", "media.*").collect()
    for r in rows:
        assert r["meta"]["n_bytes"] == len(r["data"])


def test_extract_features_shape(media_df):
    df = M.extract_features(media_df)
    # scalar feature columns, one per FEATURE_DIM slot, all double —
    # no array/map/struct in the output (driver hashers can't sort them)
    assert df.columns == ["doc_id", "n_bytes"] + M.FEATURE_COLUMNS
    assert len(M.FEATURE_COLUMNS) == M.FEATURE_DIM
    assert all(
        df.schema[c].dataType.simpleString() == "double" for c in M.FEATURE_COLUMNS
    )
    feats = df.collect()
    assert len(feats) == 20
    for r in feats:
        assert r["f_len"] == float(r["n_bytes"])
        assert 0.0 <= r["f_mean"] <= 1.0
        assert 0.0 <= r["f_first"] <= 1.0
        assert 0.0 <= r["f_last"] <= 1.0


def test_extract_features_deterministic(media_df):
    a = sorted(map(tuple, M.extract_features(media_df).collect()))
    b = sorted(map(tuple, M.extract_features(media_df).collect()))
    assert a == b


def test_frame_sample(media_df):
    frames = M.frame_sample(media_df, every_n_bytes=64, max_frames=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, fs in by_doc.items():
        ids = sorted(f["frame_id"] for f in fs)
        assert ids == list(range(len(ids)))  # contiguous frame ids from 0
        assert len(ids) <= 4
        for f in fs:
            assert f["frame_bytes"] <= 64


def test_decode_stub_raises():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="PIL"):
        M.decode_image(b"\x89PNG fake")


def test_wav_roundtrip_exact(spark, sf_dir):
    """synth_wav emits real RIFF bytes; decode_wav must recover the
    closed-form waveform statistics exactly."""
    from database_anonymiser_minimiser_spark.queries import load

    docs = load(spark, sf_dir, "documents").limit(25)
    wav = M.synth_wav(docs)
    # payload is a genuine WAVE container
    hdr = wav.select("media.data").first()[0][:12]
    assert bytes(hdr[:4]) == b"RIFF" and bytes(hdr[8:12]) == b"WAVE"
    out = {r["doc_id"]: r for r in M.decode_wav(wav).collect()}
    for did, r in out.items():
        n = 100 + did % 400
        samples = [((did * 31 + i * 17) % 65536) - 32768 for i in range(n)]
        assert r["sample_rate"] == 8000
        assert r["n_channels"] == 1
        assert r["n_samples"] == n
        assert r["duration_s"] == pytest.approx(n / 8000.0)
        assert r["s_sum"] == sum(samples)
        assert r["s_min"] == min(samples)
        assert r["s_max"] == max(samples)
