"""Video frame-sampling + PCM audio feature plumbing (multimodal binary
columns: real decode for the in-repo formats, NotImplementedError gate for
codecs absent from this environment)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from langtoolsosm_spark.functions import imagecodec as ic
from langtoolsosm_spark.operators import multimodal as mm


def _mk_video(seed: int, n_frames: int, h: int = 12, w: int = 10):
    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n_frames)]
    return frames, mm.encode_video_rawseq(frames)


def test_video_frame_sampling_roundtrip(spark):
    frames_a, buf_a = _mk_video(1, 7)
    frames_b, buf_b = _mk_video(2, 4, h=8, w=8)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": ["va", "vb"], "bytes": [buf_a, buf_b], "fmt": ["rawseq"] * 2}
        )
    )
    out = mm.sample_video_frames(df, every_n=3).toPandas()
    # va: frames 0, 3, 6; vb: frames 0, 3
    got_a = out[out.media_id == "va"].sort_values("frame_idx")
    assert list(got_a.frame_idx) == [0, 3, 6]
    assert (got_a.n_frames == 7).all() and (got_a.w == 10).all() and (got_a.h == 12).all()
    for _, r in got_a.iterrows():
        f = frames_a[r.frame_idx]
        assert r.phash == np.int64(ic.phash64(f))
        assert r.mean_milli == int(f.sum()) * 1000 // f.size
    assert list(out[out.media_id == "vb"].sort_values("frame_idx").frame_idx) == [0, 3]
    # frame decode is bit-exact
    assert (mm.decode_video_frame(buf_a, 3) == frames_a[3]).all()


def test_video_unknown_codec_raises(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": ["x"], "bytes": [b"????"], "fmt": ["h264"]})
    )
    with pytest.raises(Exception, match="NotImplementedError|h264"):
        mm.sample_video_frames(df).collect()


def test_pcm16_features_match_numpy(spark):
    sr = 8000
    t = np.arange(2500) / sr
    x = (np.sin(2 * np.pi * 440.0 * t) * 12000).astype("<i2")
    df = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": ["a"], "bytes": [x.tobytes()], "fmt": ["pcm16"]}
        )
    )
    out = (
        mm.pcm16_features(df, window=1024)
        .toPandas()
        .sort_values("win_idx")
        .reset_index(drop=True)
    )
    assert list(out.n_samples) == [1024, 1024, 452]
    xi = x.astype(np.int64)
    for _, r in out.iterrows():
        seg = xi[r.win_idx * 1024:(r.win_idx + 1) * 1024]
        assert r.energy == int((seg * seg).sum())
        assert r.peak == int(np.abs(seg).max())
        assert r.zero_crossings == int(
            (np.signbit(seg[1:]) != np.signbit(seg[:-1])).sum()
        )
    # a 440 Hz tone crosses zero ~2 * 440 / 8000 per sample
    full = out[out.n_samples == 1024]
    assert ((full.zero_crossings - 2 * 440 * 1024 / sr).abs() <= 3).all()


def test_video_scene_cuts_exact_mad_and_single_frame_skip(spark):
    """Scene-cut MAD values must equal the NumPy reference exactly; a
    single-frame clip emits no pairs."""
    frames_a, buf_a = _mk_video(3, 4)
    _, buf_single = _mk_video(4, 1)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": ["vc", "vs"],
                "bytes": [buf_a, buf_single],
                "fmt": ["rawseq"] * 2,
            }
        )
    )
    out = mm.video_scene_cuts(df, threshold_milli=10_000).toPandas()
    assert set(out.media_id) == {"vc"}
    got = out.sort_values("frame_idx")
    sz = frames_a[0].size
    for k, (prev, cur) in enumerate(zip(frames_a[:-1], frames_a[1:]), start=1):
        sad = int(np.abs(cur.astype(np.int64) - prev.astype(np.int64)).sum())
        row = got[got.frame_idx == k].iloc[0]
        assert row.mad_milli == sad * 1000 // sz
        assert row.is_cut == int(row.mad_milli >= 10_000)


def test_audio_vad_segments_islands(spark):
    """Known silence layout -> known segments: windows [0,1] active,
    [2] silent, [3,4] active gives two islands; an all-silent clip
    yields no rows."""
    w = 64
    loud = np.full(w, 2000, dtype="<i2")
    quiet = np.zeros(w, dtype="<i2")
    clip = np.concatenate([loud, loud, quiet, loud, loud]).tobytes()
    silent = np.zeros(3 * w, dtype="<i2").tobytes()
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": ["talk", "hush"],
                "bytes": [clip, silent],
                "fmt": ["pcm16"] * 2,
            }
        )
    )
    out = mm.audio_vad_segments(
        df, window=w, energy_threshold=1_000_000
    ).toPandas()
    assert set(out.media_id) == {"talk"}
    segs = out.sort_values("seg_idx")[
        ["seg_idx", "start_win", "end_win", "n_windows"]
    ].to_numpy()
    assert segs.tolist() == [[0, 0, 1, 2], [1, 3, 4, 2]]
    e = int(out.energy_sum.iloc[0])
    assert e == 2 * w * 2000 * 2000


def test_pcm16_window_features_property_vs_reference():
    """Hypothesis: the vectorized window-feature core equals a naive
    per-window Python reference on arbitrary clips — short tails, all
    zeros, alternating signs, extreme int16 values."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(
        xs=st.lists(
            st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=300
        ),
        window=st.integers(min_value=1, max_value=64),
    )
    def run(xs, window):
        x = np.array(xs, dtype=np.int64)
        nw, n_samples, energy, peak, zc = mm.pcm16_window_features(x, window)
        assert nw == (len(x) + window - 1) // window
        for w in range(nw):
            seg = x[w * window:(w + 1) * window]
            assert n_samples[w] == len(seg)
            assert energy[w] == int((seg * seg).sum())
            assert peak[w] == int(np.abs(seg).max())
            ref_zc = sum(
                1
                for i in range(len(seg) - 1)
                if (seg[i] < 0) != (seg[i + 1] < 0)
            )
            assert zc[w] == ref_zc

    run()
