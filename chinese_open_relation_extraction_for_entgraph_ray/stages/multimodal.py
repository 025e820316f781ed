"""Multimodal (image/audio/video) column plumbing.

Opaque ``binary`` payload columns with typed metadata, processed by
actor-pool ``map_batches`` stages.  The container has no image/audio codecs,
so the DECODE step is stubbed: ``mode="real"`` raises NotImplementedError at
the exact point a codec (PIL/ffmpeg) would be invoked, while ``mode="fake"``
produces a deterministic payload-derived decode so that the Ray-side plumbing
— schema, batch sizing, actor lifecycle, output layout — is real and tested.

Scale notes: payload rows are wide, so these stages run with SMALL batch
sizes (``MM_BATCH_SIZE``) and would raise ``DataContext.target_max_block_size``
for very large payloads rather than letting blocks split absurdly small.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..functions.fputil import np_round_away

MM_BATCH_SIZE = 256          # wide binary rows -> small batches
FEATURE_DIM = 8


def synthesize_payloads(batch: pa.Table) -> pa.Table:
    """docs -> fake image table: (doc_id, payload binary, width, height, fmt).

    Payload bytes are an md5 keystream of the doc text — deterministic, and
    opaque to everything downstream (as real image bytes would be).  Block
    i of the stream is md5 of the TEXT key ``img:{doc_id}:{text[:32]}:{i}``
    (not of raw digest bytes) so that an external engine with only a
    string-md5 primitive — the DuckDB oracle of ``multimodal_features`` —
    can recompute the payload byte-for-byte."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    payloads, widths, heights, fmts = [], [], [], []
    for did, text in zip(ids, texts):
        key = f"img:{did}:{text[:32]}"
        seed = hashlib.md5(key.encode()).digest()
        w = 16 + seed[0] % 48
        h = 16 + seed[1] % 48
        stream = b"".join(
            hashlib.md5(f"{key}:{i}".encode()).digest()
            for i in range((w * h + 15) // 16))
        payloads.append(stream[:w * h])
        widths.append(w)
        heights.append(h)
        fmts.append("fake-gray8")
    return pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(payloads, pa.binary()),
         pa.array(widths, pa.int32()), pa.array(heights, pa.int32()),
         pa.array(fmts, pa.string())],
        names=["doc_id", "payload", "width", "height", "format"])


class ImageFeatureExtractor:
    """Actor-pool stage: decode + feature-extract image payloads.

    ``__init__`` is where a real model/codec loads once per actor; ``__call__``
    handles one batch.  With ``mode="real"`` the decode raises
    NotImplementedError (no codec in this container)."""

    def __init__(self, mode: str = "fake"):
        self.mode = mode
        # real mode would do:  from PIL import Image; self.codec = Image

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if self.mode == "real":
            raise NotImplementedError(
                "image decode requires PIL/libjpeg, not present in this "
                "container; run with mode='fake' for the deterministic stub")
        arr = np.frombuffer(payload, dtype=np.uint8)[:width * height]
        return arr.reshape(height, width).astype(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        feats, norms = [], []
        for p, w, h in zip(payloads, widths, heights):
            img = self._decode(p, w, h)
            # 8 deterministic pooled stats as the "embedding"
            quads = [img[:h // 2, :w // 2], img[:h // 2, w // 2:],
                     img[h // 2:, :w // 2], img[h // 2:, w // 2:]]
            vec = np.array([q.mean() for q in quads] +
                           [q.std() for q in quads])
            # half-away rounding (np_round_away, the repo output
            # convention): quadrant means of integer bytes DO land exactly
            # on .5e-6 boundaries for power-of-two pixel counts, where
            # numpy's half-even would diverge from the DuckDB oracle
            vec = np_round_away(vec, 6)
            feats.append(vec.tolist())
            norms.append(float(np_round_away(
                np.linalg.norm(vec), 4)))
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()),
             pa.array(feats, pa.list_(pa.float64())),
             pa.array(norms, pa.float64())],
            names=["doc_id", "feature", "feature_norm"])


def resize_metadata(batch: pa.Table, target: int = 32) -> pa.Table:
    """Resize planning (metadata-only op; the pixel resample is part of the
    stubbed decode): scale factors + output dims per row."""
    import pyarrow.compute as pc

    w = batch.column("width").cast(pa.float64())
    h = batch.column("height").cast(pa.float64())
    scale = pc.min_element_wise(pc.divide(float(target), w),
                                pc.divide(float(target), h))
    return (batch.append_column("scale", pc.round(scale, ndigits=4))
            .append_column("out_w", pc.round(pc.multiply(w, scale), ndigits=0)
                           .cast(pa.int32()))
            .append_column("out_h", pc.round(pc.multiply(h, scale), ndigits=0)
                           .cast(pa.int32()))).drop_columns(["payload"])


def frame_sample_plan(batch: pa.Table, every_n: int = 8) -> pa.Table:
    """Video frame-sampling plan: one row per sampled frame index (the decode
    of each frame is the stubbed step)."""
    ids = batch.column("doc_id").to_pylist()
    widths = batch.column("width").to_pylist()
    out_id, out_frame = [], []
    for did, w in zip(ids, widths):
        n_frames = 8 + (w % 24)          # deterministic fake frame count
        for f in range(0, n_frames, every_n):
            out_id.append(did)
            out_frame.append(f)
    return pa.Table.from_arrays(
        [pa.array(out_id, pa.int64()), pa.array(out_frame, pa.int32())],
        names=["doc_id", "frame_idx"])


def synthesize_audio_payloads(batch: pa.Table) -> pa.Table:
    """docs -> fake audio table: (doc_id, payload binary, sample_rate,
    n_samples, codec).  Same opaque-binary contract as images."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    payloads, rates, counts, codecs = [], [], [], []
    for did, text in zip(ids, texts):
        key = f"aud:{did}:{text[:32]}"        # text-keyed blocks, see
        seed = hashlib.md5(key.encode()).digest()   # synthesize_payloads
        n = 1024 + seed[0] * 16               # fake sample count
        stream = b"".join(
            hashlib.md5(f"{key}:{i}".encode()).digest()
            for i in range((n + 15) // 16))
        payloads.append(stream[:n])
        rates.append(16000)
        counts.append(n)
        codecs.append("fake-pcm8")
    return pa.Table.from_arrays(
        [pa.array(ids, pa.int64()), pa.array(payloads, pa.binary()),
         pa.array(rates, pa.int32()), pa.array(counts, pa.int32()),
         pa.array(codecs, pa.string())],
        names=["doc_id", "payload", "sample_rate", "n_samples", "codec"])


class AudioFeatureExtractor:
    """Actor-pool stage: decode + frame-energy features for audio payloads.

    ``mode="real"`` raises NotImplementedError where ffmpeg/soundfile would
    decode; ``mode="fake"`` interprets the payload as 8-bit PCM so the
    framing/feature plumbing is real and deterministic."""

    FRAME = 256

    def __init__(self, mode: str = "fake"):
        self.mode = mode

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.mode == "real":
            raise NotImplementedError(
                "audio decode requires ffmpeg/soundfile, not present in this "
                "container; run with mode='fake' for the deterministic stub")
        return (np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
                - 128.0) / 128.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rates = batch.column("sample_rate").to_pylist()
        out_n_frames, out_rms, out_peak, out_dur = [], [], [], []
        for p, rate in zip(payloads, rates):
            pcm = self._decode(p)
            n_frames = max(1, len(pcm) // self.FRAME)
            frames = pcm[:n_frames * self.FRAME].reshape(n_frames, self.FRAME)
            rms = np.sqrt((frames ** 2).mean(axis=1))
            out_n_frames.append(n_frames)
            # half-away rounding: peak is an exact multiple of 1/128, so
            # x.5e-6 boundaries are common and Python's half-even round
            # would diverge from the DuckDB oracle on ~half of them
            out_rms.append(float(np_round_away(rms.mean(), 6)))
            out_peak.append(float(np_round_away(
                np.abs(pcm).max() if len(pcm) else 0.0, 6)))
            out_dur.append(float(np_round_away(len(pcm) / rate, 6)))
        return pa.Table.from_arrays(
            [pa.array(ids, pa.int64()), pa.array(out_n_frames, pa.int32()),
             pa.array(out_rms, pa.float64()), pa.array(out_peak, pa.float64()),
             pa.array(out_dur, pa.float64())],
            names=["doc_id", "n_frames", "rms_energy", "peak", "duration_sec"])
