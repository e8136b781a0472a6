"""G.711 mu-law / A-law codecs (WAV format tags 7 and 6), numpy only.

The ITU-T G.711 logarithmic companders — the telephony standard and
the simplest real lossy audio codec: 16-bit PCM -> 8-bit codewords at
~37 dB SNR, one byte per sample, no inter-sample state.  Statelessness
is what makes this the ideal 100-TB audio normalization stage: encode
is a handful of whole-array numpy ops (segment lookup via
``searchsorted``, mantissa shift), decode is a single 256-entry table
gather — both embarrassingly vectorizable inside ``map_batches`` with
zero per-row Python.

Semantics follow the classic Sun Microsystems g711.c convention (the
one CPython's ``audioop``, SoX and libsndfile all implement): mu-law
companding in 14-bit space with bias 0x84 and clip 8159; A-law in
13-bit space with even-bit (0x55) inversion.  ``tests/test_g711.py``
pins all four kernels against ``audioop`` for every one of the 65536
int16 inputs and all 256 codewords (import-gated: audioop is removed
in Python 3.13).

Invariants the ``g711_ops`` gate exploits:
- the encoder never emits mu-law code 0x7F (negative zero), so
  encode(decode(stream)) == stream holds bit-exactly for any encoder
  output — a lossless *requantization* check on a lossy codec;
- the WAV container size is pure arithmetic: 58 + n_samples (+pad)
  for the fmt-6/7 layout with a fact chunk.

No reference analogue (the reference has no audio); extends the audio
matrix (pcm16/wav/adpcm/flac) in ``stages/decode.py``.
"""

from __future__ import annotations

import struct

import numpy as np

# Segment end tables (Sun g711.c): first index whose end >= magnitude
# is the segment number.
_SEG_UEND = np.array(
    [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF], np.int32
)
_SEG_AEND = np.array(
    [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], np.int32
)

_ULAW_BIAS_14 = 0x84 >> 2  # bias in the 14-bit companding space
_ULAW_CLIP_14 = 8159


def ulaw_encode(pcm16: np.ndarray) -> np.ndarray:
    """int16 PCM -> mu-law codewords (uint8), whole-array numpy."""
    x = np.asarray(pcm16).astype(np.int32) >> 2  # 16 -> 14 bit
    neg = x < 0
    mask = np.where(neg, 0x7F, 0xFF)
    mag = np.minimum(np.where(neg, -x, x), _ULAW_CLIP_14) + _ULAW_BIAS_14
    seg = np.searchsorted(_SEG_UEND, mag, side="left")
    uval = (seg << 4) | ((mag >> (np.minimum(seg, 7) + 1)) & 0xF)
    out = np.where(seg >= 8, 0x7F, uval)
    return ((out ^ mask) & 0xFF).astype(np.uint8)


def alaw_encode(pcm16: np.ndarray) -> np.ndarray:
    """int16 PCM -> A-law codewords (uint8), whole-array numpy."""
    x = np.asarray(pcm16).astype(np.int32) >> 3  # 16 -> 13 bit
    neg = x < 0
    mask = np.where(neg, 0x55, 0xD5)  # A-law: sign bit SET = positive
    mag = np.where(neg, -x - 1, x)
    seg = np.searchsorted(_SEG_AEND, mag, side="left")
    segc = np.minimum(seg, 7)
    aval = (segc << 4) | np.where(
        segc < 2, (mag >> 1) & 0xF, (mag >> segc) & 0xF
    )
    out = np.where(seg >= 8, 0x7F, aval)
    return ((out ^ mask) & 0xFF).astype(np.uint8)


def _ulaw_dec_table() -> np.ndarray:
    c = np.arange(256, dtype=np.int32)
    u = ~c & 0xFF
    t = (((u & 0xF) << 3) + 0x84) << ((u >> 4) & 7)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _alaw_dec_table() -> np.ndarray:
    c = np.arange(256, dtype=np.int32)
    a = c ^ 0x55
    seg = (a >> 4) & 7
    t = (a & 0xF) << 4
    t = np.where(
        seg == 0,
        t + 8,
        np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)),
    )
    return np.where(a & 0x80, t, -t).astype(np.int16)


ULAW_DECODE_TABLE = _ulaw_dec_table()
ALAW_DECODE_TABLE = _alaw_dec_table()

# WAVE_FORMAT tags (Microsoft registry, public)
WAV_FMT_ALAW = 0x0006
WAV_FMT_ULAW = 0x0007


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    """mu-law codewords -> int16 PCM: a single table gather."""
    return ULAW_DECODE_TABLE[np.asarray(codes, np.uint8)]


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """A-law codewords -> int16 PCM: a single table gather."""
    return ALAW_DECODE_TABLE[np.asarray(codes, np.uint8)]


def encode_wav_g711(
    pcm: np.ndarray, law: str, sample_rate: int = 16000
) -> bytes:
    """Mono G.711 RIFF/WAVE (fmt tag 7=mu-law / 6=A-law, 8 bits/sample,
    fact chunk with the sample count).  Container size is exactly
    ``58 + n + (n & 1)`` bytes — the SQL-predictable structural
    evidence the g711_ops gate checks."""
    pcm = np.asarray(pcm, np.int16).reshape(-1)
    if len(pcm) == 0:
        raise ValueError("empty PCM clip")
    if law == "ulaw":
        tag, data = WAV_FMT_ULAW, ulaw_encode(pcm).tobytes()
    elif law == "alaw":
        tag, data = WAV_FMT_ALAW, alaw_encode(pcm).tobytes()
    else:
        raise ValueError(f"unknown G.711 law {law!r}")
    fmt = struct.pack("<HHIIHHH", tag, 1, sample_rate, sample_rate, 1, 8, 0)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, len(pcm))
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
