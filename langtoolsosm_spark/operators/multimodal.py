"""Multimodal columns beyond still images: video frame-sampling and audio
feature extraction over opaque binary columns (SURVEY.md §2.1 image-source
family; the training-pipeline operator set from BASELINE.json:input_hint).

Design: media stay opaque ``binary`` columns with typed metadata; all
compute is ``mapInPandas`` over Arrow batches (vectorized NumPy per frame/
window, no per-row Python loops over samples). Codecs the sandbox can't
support (h264/opus/...) raise NotImplementedError at the registry gate —
the Spark-side plumbing (schema, batching, partitioning) is real and
tested either way:

* video: a from-scratch raw-sequence container (header + fixed-size RGB
  frames) makes frame decode REAL here — sampled frames run through the
  same pHash as still images.
* audio: 16-bit PCM is decoded for real (bytes -> int16), and windowed
  features are exact integers (energy = sum of squares, zero crossings),
  so results are bit-stable at any parallelism.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

VIDEO_MAGIC = b"RVSQ"
SUPPORTED_VIDEO = {"rawseq"}
SUPPORTED_AUDIO = {"pcm16"}


def encode_video_rawseq(frames: list[np.ndarray]) -> bytes:
    """Container: magic + (n_frames, h, w) uint32 LE + raw RGB frames."""
    if not frames:
        raise ValueError("empty frame list")
    h, w = frames[0].shape[0], frames[0].shape[1]
    out = [VIDEO_MAGIC, struct.pack("<III", len(frames), h, w)]
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share (h, w, 3)")
        out.append(np.ascontiguousarray(f, dtype=np.uint8).tobytes())
    return b"".join(out)


def _video_header(buf: bytes) -> tuple[int, int, int]:
    if len(buf) < 16:
        raise ValueError(
            f"rawseq buffer too short for its 16-byte header: {len(buf)} bytes"
        )
    if buf[:4] != VIDEO_MAGIC:
        raise ValueError("not a rawseq video")
    n, h, w = struct.unpack("<III", buf[4:16])
    return n, h, w


def _video_frames_avail(buf: bytes) -> tuple[int, int, int]:
    """Header + truncation clamp: (n_decodable, h, w). The frame count is
    clamped to the whole frames actually present in the buffer, mirroring
    ``pcm16_features``' trailing-byte leniency — a truncated clip yields
    its decodable prefix instead of an opaque reshape ValueError. A buffer
    too short for even the header still raises (that is corrupt, not
    truncated payload)."""
    n, h, w = _video_header(buf)
    sz = h * w * 3
    if sz == 0:
        return 0, h, w
    return min(n, (len(buf) - 16) // sz), h, w


def decode_video_frame(buf: bytes, idx: int) -> np.ndarray:
    n, h, w = _video_header(buf)
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} of {n}")
    sz = h * w * 3
    off = 16 + idx * sz
    if len(buf) < off + sz:
        raise ValueError(
            f"rawseq buffer truncated: frame {idx} needs bytes "
            f"[{off}, {off + sz}) but buffer holds {len(buf)}"
        )
    return np.frombuffer(buf[off:off + sz], dtype=np.uint8).reshape(h, w, 3)


def sample_video_frames(
    videos: DataFrame,
    every_n: int = 2,
    id_col: str = "media_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Sample every ``every_n``-th frame of each video: one output row per
    sampled frame with (media_id, frame_idx, n_frames, w, h, mean_milli,
    phash). Real decode + pHash for the rawseq container; other formats
    raise NotImplementedError (no codec libs in this environment).
    Truncated clips yield their decodable whole-frame prefix (n_frames
    reports the decodable count). Per clip, ALL sampled frames decode as
    one (k, h, w, 3) tensor and hash through one batched DCT
    (``phash64_batch`` — bit-identical to the scalar path); no per-frame
    Python loop."""
    from ..functions import imagecodec as ic

    def kernel(batches):
        for pdf in batches:
            frames = []
            for mid, buf, fmt in zip(pdf[id_col], pdf[bytes_col], pdf[fmt_col]):
                if fmt not in SUPPORTED_VIDEO:
                    raise NotImplementedError(
                        f"video codec {fmt!r}: only {sorted(SUPPORTED_VIDEO)} "
                        "decode in this environment"
                    )
                n, h, w = _video_frames_avail(buf)
                sz = h * w * 3
                sel = np.arange(0, n, every_n)
                if len(sel) == 0:
                    continue
                px = np.frombuffer(
                    buf, dtype=np.uint8, offset=16, count=n * sz
                ).reshape(n, h, w, 3)[sel]
                # exact integer mean in milli (sum is exact int)
                means = px.reshape(len(sel), -1).sum(axis=1, dtype=np.int64) * 1000 // sz
                frames.append(
                    pd.DataFrame(
                        {
                            id_col: np.repeat(np.array([mid], dtype=object), len(sel)),
                            "frame_idx": sel.astype(np.int32),
                            "n_frames": np.full(len(sel), n, dtype=np.int32),
                            "w": np.full(len(sel), w, dtype=np.int32),
                            "h": np.full(len(sel), h, dtype=np.int32),
                            "mean_milli": means,
                            "phash": ic.phash64_batch(px),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return videos.select(id_col, bytes_col, fmt_col).mapInPandas(
        kernel,
        schema=f"{id_col} string, frame_idx int, n_frames int, w int, h int, "
        "mean_milli long, phash long",
    )


def video_scene_cuts(
    videos: DataFrame,
    threshold_milli: int = 25_000,
    id_col: str = "media_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Scene-cut candidates: per consecutive frame pair, the exact
    integer mean absolute pixel difference in milli-units
    (sum|a-b| * 1000 // (h*w*3)); ``is_cut`` flags pairs at or above
    ``threshold_milli``. One output row per frame pair, indexed by the
    LATER frame — the standard cheap shot-boundary detector, fully
    integer so any engine reproduces it bit-exactly. Vectorized: one
    np.abs diff over the whole (n_frames, h*w*3) matrix per clip."""

    def kernel(batches):
        for pdf in batches:
            ids, idxs, mads, cuts = [], [], [], []
            for mid, buf, fmt in zip(pdf[id_col], pdf[bytes_col], pdf[fmt_col]):
                if fmt not in SUPPORTED_VIDEO:
                    raise NotImplementedError(
                        f"video codec {fmt!r}: only {sorted(SUPPORTED_VIDEO)} "
                        "decode in this environment"
                    )
                n, h, w = _video_frames_avail(buf)
                if n < 2:
                    continue
                sz = h * w * 3
                px = np.frombuffer(buf[16:16 + n * sz], dtype=np.uint8).reshape(n, sz)
                sad = np.abs(
                    px[1:].astype(np.int64) - px[:-1].astype(np.int64)
                ).sum(axis=1)
                mad = sad * 1000 // sz
                ids.extend([mid] * (n - 1))
                idxs.extend(range(1, n))
                mads.extend(mad.tolist())
                cuts.extend((mad >= threshold_milli).astype(np.int32).tolist())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="object"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "mad_milli": pd.Series(mads, dtype="int64"),
                    "is_cut": pd.Series(cuts, dtype="int32"),
                }
            )

    return videos.select(id_col, bytes_col, fmt_col).mapInPandas(
        kernel,
        schema=f"{id_col} string, frame_idx int, mad_milli long, is_cut int",
    )


def audio_vad_segments(
    audio: DataFrame,
    window: int = 1024,
    energy_threshold: int = 1_000_000_000,
    id_col: str = "media_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Voice-activity segments: windows whose exact integer energy meets
    ``energy_threshold`` are active; consecutive active windows merge
    into segments (gaps-and-islands). Output one row per segment:
    (media_id, seg_idx, start_win, end_win, n_windows, energy_sum).

    Composition, not a new kernel: the decode + per-window features come
    from ``pcm16_features``; the segmentation itself is pure JVM window
    arithmetic (win_idx - row_number island key), so everything after the
    Arrow batch decode stays in whole-stage codegen and shuffles once on
    the media id."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    feats = pcm16_features(audio, window, id_col, bytes_col, fmt_col)
    active = feats.filter(F.col("energy") >= energy_threshold)
    wseq = W.partitionBy(id_col).orderBy("win_idx")
    grp = (F.col("win_idx") - F.row_number().over(wseq)).alias("__grp")
    segs = (
        active.select(id_col, "win_idx", "energy", grp)
        .groupBy(id_col, "__grp")
        .agg(
            F.min("win_idx").alias("start_win"),
            F.max("win_idx").alias("end_win"),
            F.count(F.lit(1)).cast("int").alias("n_windows"),
            F.sum("energy").alias("energy_sum"),
        )
    )
    wseg = W.partitionBy(id_col).orderBy("start_win")
    return segs.select(
        id_col,
        (F.row_number().over(wseg) - 1).cast("int").alias("seg_idx"),
        "start_win",
        "end_win",
        "n_windows",
        "energy_sum",
    )


def pcm16_window_features(x: "np.ndarray", window: int):
    """Pure window-feature core (property-tested without Spark): given a
    clip's int64 samples, return (n_windows, n_samples, energy, peak,
    zero_crossings) arrays. Vectorizes over ALL windows at once — pad
    with zeros, reshape to (n_windows, window); zero padding contributes
    nothing to energy or |peak|. Zero crossings count sign flips between
    consecutive samples WITHIN a window (pairs straddling window
    boundaries excluded; 0 counts as non-negative via signbit)."""
    n = len(x)
    nw = (n + window - 1) // window
    pad = np.zeros(nw * window, dtype=np.int64)
    pad[:n] = x
    m = pad.reshape(nw, window)
    n_samples = np.minimum(window, n - np.arange(nw, dtype=np.int64) * window)
    energy = (m * m).sum(axis=1)
    peak = np.abs(m).max(axis=1)
    cross = np.signbit(x[1:]) != np.signbit(x[:-1])
    pair_idx = np.flatnonzero(cross)
    pair_idx = pair_idx[(pair_idx % window) != window - 1]
    zc = np.bincount(pair_idx // window, minlength=nw).astype(np.int64)
    return nw, n_samples, energy, peak, zc


def pcm16_features(
    audio: DataFrame,
    window: int = 1024,
    id_col: str = "media_id",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
) -> DataFrame:
    """Windowed audio features over 16-bit little-endian PCM: per window,
    exact integer energy (sum of squares), peak amplitude, and
    zero-crossing count — the standard cheap VAD/quality trio. Vectorized
    NumPy over each clip; short final windows are kept (n_samples says how
    many samples they hold)."""

    def kernel(batches):
        for pdf in batches:
            frames = []
            for mid, buf, fmt in zip(pdf[id_col], pdf[bytes_col], pdf[fmt_col]):
                if fmt not in SUPPORTED_AUDIO:
                    raise NotImplementedError(
                        f"audio codec {fmt!r}: only {sorted(SUPPORTED_AUDIO)} "
                        "decode in this environment"
                    )
                # drop a trailing odd byte (truncated final sample) rather
                # than raising — matches the oracle's octet_length // 2
                x = np.frombuffer(buf[: len(buf) // 2 * 2], dtype="<i2").astype(np.int64)
                n = len(x)
                if n == 0:
                    continue
                nw, n_samples, energy, peak, zc = pcm16_window_features(x, window)
                frames.append(
                    pd.DataFrame(
                        {
                            id_col: np.repeat(np.array([mid], dtype=object), nw),
                            "win_idx": np.arange(nw, dtype=np.int32),
                            "n_samples": n_samples.astype(np.int32),
                            "energy": energy,
                            "peak": peak,
                            "zero_crossings": zc,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return audio.select(id_col, bytes_col, fmt_col).mapInPandas(
        kernel,
        schema=f"{id_col} string, win_idx int, n_samples int, energy long, "
        "peak long, zero_crossings long",
    )
