"""IMA / DVI ADPCM codec (WAV format tag 0x11), numpy only.

The classic 4-bit adaptive-delta codec: each 256-byte block carries a
4-byte header (initial int16 predictor, step-table index, reserved
byte) and 252 bytes of 4-bit nibbles — 505 samples per block, 4:1
compression, ~30 dB SNR on tonal content.  Blocks are independently
decodable (the header re-seeds the predictor), which is exactly what
makes the codec vectorizable here: the kernels run the 504-step
recurrence once while operating on ALL blocks of a whole batch as one
numpy lane — per-sample work is O(samples-per-block) numpy ops no
matter how many clips are in flight, the same stacking trick as the
FLAC Rice coder (stages/flac.py).

Encoder block-start step index is derived from the block's own first
few deltas (``searchsorted`` into the step table) so blocks stay
independent on the encode side too; the index is stored in the header,
so any spec-conforming decoder agrees.

Container: mono RIFF/WAVE with the standard ADPCM ``fmt `` extension
(cbSize=2, wSamplesPerBlock) and a ``fact`` chunk carrying the true
sample count (the final block is padded by repeating the last sample).

Step/index tables are the published IMA ADPCM constants (Interactive
Multimedia Association, "Recommended Practices for Enhancing Digital
Audio Compatibility", 1992) — public-spec numbers any implementation
must contain.  No reference analogue (the reference has no audio);
extends the audio matrix (pcm16/wav/flac) in ``stages/decode.py``.
"""

from __future__ import annotations

import struct

import numpy as np

IMA_STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], np.int32)

IMA_INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], np.int32)

BLOCK_ALIGN = 256
SAMPLES_PER_BLOCK = (BLOCK_ALIGN - 4) * 2 + 1  # 505


def adpcm_encode_blocks(
    samples: np.ndarray, idx0: np.ndarray
) -> np.ndarray:
    """(nb, 505) int32 samples + (nb,) initial indices -> (nb, 504)
    uint8 nibbles.  One sequential pass over sample positions,
    vectorized across blocks."""
    nb, spb = samples.shape
    pred = samples[:, 0].astype(np.int32).copy()
    idx = np.asarray(idx0, np.int32).copy()
    nib = np.empty((nb, spb - 1), np.uint8)
    for j in range(spb - 1):
        s = samples[:, j + 1]
        step = IMA_STEP_TABLE[idx]
        delta = s - pred
        sign = delta < 0
        mag = np.abs(delta)
        b2 = mag >= step
        mag = mag - b2 * step
        hs = step >> 1
        b1 = mag >= hs
        mag = mag - b1 * hs
        qs = step >> 2
        b0 = mag >= qs
        n = (sign * 8 + b2 * 4 + b1 * 2 + b0).astype(np.uint8)
        # reconstruct exactly as the decoder will, so pred never drifts
        diff = (step >> 3) + b0 * qs + b1 * hs + b2 * step
        pred = np.clip(pred + np.where(sign, -diff, diff), -32768, 32767)
        idx = np.clip(idx + IMA_INDEX_TABLE[n & 7], 0, 88)
        nib[:, j] = n
    return nib


def adpcm_decode_blocks(
    pred0: np.ndarray, idx0: np.ndarray, nib: np.ndarray
) -> np.ndarray:
    """(nb,) header predictors/indices + (nb, 504) nibbles -> (nb, 505)
    int16 samples; the inverse lane-parallel recurrence."""
    nb, m = nib.shape
    out = np.empty((nb, m + 1), np.int16)
    pred = np.asarray(pred0, np.int32).copy()
    idx = np.asarray(idx0, np.int32).copy()
    if np.any(idx > 88) or np.any(idx < 0):
        raise ValueError("ADPCM block header step index out of range")
    out[:, 0] = pred
    for j in range(m):
        n = nib[:, j].astype(np.int32)
        step = IMA_STEP_TABLE[idx]
        qs = step >> 2
        hs = step >> 1
        diff = (step >> 3) + (n & 1) * qs + ((n >> 1) & 1) * hs + (
            (n >> 2) & 1
        ) * step
        pred = np.clip(
            pred + np.where(n & 8, -diff, diff), -32768, 32767
        )
        idx = np.clip(idx + IMA_INDEX_TABLE[n & 7], 0, 88)
        out[:, j + 1] = pred
    return out


def _block_init_indices(samples: np.ndarray) -> np.ndarray:
    """Per-block starting step index from the block's own early deltas
    (closest step >= mean |delta| over the first 8 samples) — keeps
    encode block-independent; the choice is recorded in the header so
    any decoder agrees."""
    d0 = np.abs(np.diff(samples[:, :8], axis=1)).mean(axis=1).astype(np.int32)
    return np.clip(np.searchsorted(IMA_STEP_TABLE, d0), 0, 88).astype(np.int32)


def _stack_blocks(pcm: np.ndarray) -> tuple[np.ndarray, int]:
    """Pad a clip to whole blocks (repeating the final sample) and
    reshape to (nb, 505) int32."""
    pcm = np.asarray(pcm, np.int32)
    if len(pcm) == 0:
        raise ValueError("empty PCM clip")
    nb = -(-len(pcm) // SAMPLES_PER_BLOCK)
    pad = nb * SAMPLES_PER_BLOCK - len(pcm)
    if pad:
        pcm = np.concatenate([pcm, np.full(pad, pcm[-1], np.int32)])
    return pcm.reshape(nb, SAMPLES_PER_BLOCK), nb


def _pack_nibbles(nib: np.ndarray) -> np.ndarray:
    """(nb, 504) nibbles -> (nb, 252) bytes, low nibble first."""
    return (nib[:, 0::2] | (nib[:, 1::2] << 4)).astype(np.uint8)


def _unpack_nibbles(data: np.ndarray) -> np.ndarray:
    """(nb, 252) bytes -> (nb, 504) nibbles, low nibble first."""
    nb, m = data.shape
    out = np.empty((nb, m * 2), np.uint8)
    out[:, 0::2] = data & 0x0F
    out[:, 1::2] = data >> 4
    return out


def adpcm_data_from_pcm(pcm: np.ndarray) -> bytes:
    """Clip -> raw ADPCM block stream (headers + packed nibbles)."""
    blocks, nb = _stack_blocks(pcm)
    idx0 = _block_init_indices(blocks)
    nib = adpcm_encode_blocks(blocks, idx0)
    out = np.empty((nb, BLOCK_ALIGN), np.uint8)
    hdr = out[:, :4]
    pred16 = blocks[:, 0].astype("<i2").view(np.uint8).reshape(nb, 2)
    hdr[:, :2] = pred16
    hdr[:, 2] = idx0.astype(np.uint8)
    hdr[:, 3] = 0
    out[:, 4:] = _pack_nibbles(nib)
    return out.tobytes()


def pcm_from_adpcm_data(data: bytes, n_samples: int) -> np.ndarray:
    """Raw ADPCM block stream -> int16 samples, truncated to the fact
    count."""
    if len(data) % BLOCK_ALIGN:
        raise ValueError(
            f"ADPCM data length {len(data)} not a multiple of "
            f"block align {BLOCK_ALIGN}"
        )
    nb = len(data) // BLOCK_ALIGN
    if nb * SAMPLES_PER_BLOCK < n_samples:
        raise ValueError("ADPCM fact count exceeds decoded samples")
    raw = np.frombuffer(data, np.uint8).reshape(nb, BLOCK_ALIGN)
    pred0 = raw[:, :2].copy().view("<i2").reshape(nb).astype(np.int32)
    idx0 = raw[:, 2].astype(np.int32)
    nib = _unpack_nibbles(raw[:, 4:])
    return adpcm_decode_blocks(pred0, idx0, nib).reshape(-1)[:n_samples]


def encode_wav_adpcm(pcm: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Mono IMA-ADPCM RIFF/WAVE: standard fmt extension (cbSize=2,
    wSamplesPerBlock) + fact chunk with the true sample count.
    Container size is exactly ``60 + ceil(n/505) * 256`` bytes — the
    SQL-predictable structural evidence the adpcm_ops gate checks."""
    data = adpcm_data_from_pcm(pcm)
    n = len(np.asarray(pcm).reshape(-1))
    avg_bps = (sample_rate * BLOCK_ALIGN + SAMPLES_PER_BLOCK - 1) // (
        SAMPLES_PER_BLOCK
    )
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, avg_bps, BLOCK_ALIGN, 4, 2,
        SAMPLES_PER_BLOCK,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
