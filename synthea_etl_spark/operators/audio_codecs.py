"""Compressed-audio codecs for WAV payloads — G.711 (mu-law / A-law)
and IMA/DVI ADPCM — pure Python + numpy, no audio library.

Beyond-reference multimodal surface (the reference repo has no media
code; builder's-brief LLM-pipeline scope). Public knowledge only:
ITU-T G.711 (the segmented logarithmic companding laws, here as their
standard closed-form bit expansions) and the IMA ADPCM algorithm
(step/index tables and the 4-bit quantizer, as published in the IMA
Digital Audio Focus Group recommendations and the multimedia
programming interface spec's WAVE appendix).

Each decoder ships with an encoder twin so the tests can pin
round-trip properties without any external codec:

- G.711 is an exact bijection on its 256 code points: for every byte
  b, ``linear_to_ulaw(ulaw_to_linear(b)) == b`` (and A-law alike) —
  tested exhaustively over all 256 codes.
- IMA ADPCM is lossy; the twin is the standard quantizer, and the
  tests assert state-machine agreement (decode(encode(x)) tracks x
  within the current step size) plus the exact all-zero-nibble
  invariant the q139 oracle uses: nibble 0 at step index 0 moves the
  predictor by step_table[0] >> 3 == 0, so a block of zero nibbles
  holds its header predictor for every sample.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# G.711 mu-law / A-law
# ---------------------------------------------------------------------------

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 0x1FFF << 2  # 32635 after bias handling; see linear_to_ulaw


def _build_ulaw_table() -> np.ndarray:
    """byte code -> linear sample, the standard mu-law expansion:
    invert the code, split into sign / 3-bit segment / 4-bit mantissa,
    then magnitude = ((mantissa << 3) + BIAS) << segment - BIAS."""
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        t = ((u & 0x0F) << 3) + _ULAW_BIAS
        t <<= (u & 0x70) >> 4
        out[b] = (_ULAW_BIAS - t) if (u & 0x80) else (t - _ULAW_BIAS)
    return out


def _build_alaw_table() -> np.ndarray:
    """byte code -> linear sample, the standard A-law expansion: XOR
    0x55, then piecewise — segment 0 is linear, higher segments shift;
    sign bit SET means positive in A-law (opposite of mu-law)."""
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[b] = t if (a & 0x80) else -t
    return out


_ULAW_TABLE = _build_ulaw_table()
_ALAW_TABLE = _build_alaw_table()


def ulaw_to_linear(codes: np.ndarray | bytes) -> np.ndarray:
    """Vectorized mu-law byte codes -> int16 linear samples."""
    return _ULAW_TABLE[np.frombuffer(bytes(codes), np.uint8)
                       if isinstance(codes, (bytes, bytearray))
                       else np.asarray(codes, np.uint8)]


def alaw_to_linear(codes: np.ndarray | bytes) -> np.ndarray:
    """Vectorized A-law byte codes -> int16 linear samples."""
    return _ALAW_TABLE[np.frombuffer(bytes(codes), np.uint8)
                       if isinstance(codes, (bytes, bytearray))
                       else np.asarray(codes, np.uint8)]


def linear_to_ulaw(sample: int) -> int:
    """Encoder twin (scalar): linear int16 -> mu-law byte, standard
    segmented search. Exact inverse of ulaw_to_linear on its image."""
    sign = 0x80 if sample < 0 else 0
    if sample < 0:
        sample = -sample
    if sample > 32635:
        sample = 32635
    sample += _ULAW_BIAS
    seg = 7
    for s in range(8):
        if sample < (0x100 << s):
            seg = s
            break
    mant = (sample >> (seg + 3)) & 0x0F
    return ~(sign | (seg << 4) | mant) & 0xFF


def linear_to_alaw(sample: int) -> int:
    """Encoder twin (scalar): linear int16 -> A-law byte."""
    sign = 0x80 if sample >= 0 else 0
    if sample < 0:
        sample = -sample
    if sample > 32767:
        sample = 32767
    if sample < 0x100:
        seg = 0
    else:
        seg = 1
        while seg < 7 and sample >= (0x100 << seg):
            seg += 1
    if seg == 0:
        mant = sample >> 4
    else:
        mant = (sample >> (seg + 3)) & 0x0F
    return (sign | (seg << 4) | mant) ^ 0x55


# ---------------------------------------------------------------------------
# IMA / DVI ADPCM (WAVE format tag 0x11)
# ---------------------------------------------------------------------------

IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_nibble(n: int, pred: int, index: int) -> tuple[int, int]:
    """One IMA ADPCM step: 4-bit code + (predictor, step index) ->
    new (predictor, step index)."""
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    pred = pred - diff if n & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + IMA_INDEX_TABLE[n]))
    return pred, index


def _ima_encode_sample(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """One IMA ADPCM quantizer step: sample + state -> (nibble, new
    predictor, new step index). Standard bit-serial quantizer; the
    decoder twin reconstructs exactly the predictor returned here."""
    step = IMA_STEP_TABLE[index]
    delta = sample - pred
    nib = 0
    if delta < 0:
        nib = 8
        delta = -delta
    if delta >= step:
        nib |= 4
        delta -= step
    if delta >= step >> 1:
        nib |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nib |= 1
    pred, index = _ima_decode_nibble(nib, pred, index)
    return nib, pred, index


def decode_ima_adpcm_block(
    block: bytes, nch: int
) -> np.ndarray | None:
    """One IMA ADPCM WAVE block -> (n_samples, nch) int16 samples.
    Block layout per the WAVE appendix: a 4-byte header per channel
    (int16 LE initial predictor — which IS the first output sample —
    uint8 step index, reserved byte), then 4-byte nibble groups
    interleaved per channel (8 nibbles each, low nibble first)."""
    if len(block) < 4 * nch or (len(block) - 4 * nch) % (4 * nch):
        return None
    preds = []
    idxs = []
    for c in range(nch):
        p = struct.unpack_from("<h", block, 4 * c)[0]
        ix = block[4 * c + 2]
        if ix > 88:
            return None
        preds.append(p)
        idxs.append(ix)
    groups = (len(block) - 4 * nch) // (4 * nch)
    n_samples = 1 + groups * 8
    out = np.empty((n_samples, nch), dtype=np.int16)
    out[0] = preds
    pos = 4 * nch
    for g in range(groups):
        for c in range(nch):
            chunk = block[pos : pos + 4]
            pos += 4
            for j in range(8):
                byte = chunk[j // 2]
                nib = byte & 0x0F if j % 2 == 0 else byte >> 4
                preds[c], idxs[c] = _ima_decode_nibble(nib, preds[c], idxs[c])
                out[1 + g * 8 + j, c] = preds[c]
    return out


def decode_ima_adpcm(
    data: bytes, nch: int, block_align: int
) -> np.ndarray | None:
    """Full data chunk -> stacked (n_samples, nch) int16 samples;
    None on ragged blocks or invalid state bytes."""
    if block_align < 4 * nch or len(data) % block_align:
        return None
    blocks = []
    for off in range(0, len(data), block_align):
        dec = decode_ima_adpcm_block(data[off : off + block_align], nch)
        if dec is None:
            return None
        blocks.append(dec)
    if not blocks:
        return np.empty((0, nch), dtype=np.int16)
    return np.concatenate(blocks, axis=0)


def encode_ima_adpcm(
    channels: list[list[int]],
    samples_per_block: int,
    init_indexes: list[int] | None = None,
) -> tuple[bytes, int]:
    """Encoder twin: per-channel int16 sample lists -> (data bytes,
    block_align). ``samples_per_block`` must be 1 + a multiple of 8;
    total length must be a multiple of it. The first sample of each
    block is stored verbatim as the header predictor (the standard
    layout), so all-constant input encodes to all-zero nibbles at
    index 0 — the exactness hook the oracle arithmetic relies on."""
    nch = len(channels)
    n = len(channels[0])
    if samples_per_block < 1 or (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 1 + 8k")
    if any(len(c) != n for c in channels) or n % samples_per_block:
        raise ValueError("channel lengths must be equal block multiples")
    groups = (samples_per_block - 1) // 8
    block_align = 4 * nch + groups * 4 * nch
    idxs = list(init_indexes or [0] * nch)
    out = bytearray()
    for b0 in range(0, n, samples_per_block):
        preds = [int(channels[c][b0]) for c in range(nch)]
        for c in range(nch):
            out += struct.pack("<hBB", preds[c], idxs[c], 0)
        for g in range(groups):
            for c in range(nch):
                nibs = []
                for j in range(8):
                    s = int(channels[c][b0 + 1 + g * 8 + j])
                    nib, preds[c], idxs[c] = _ima_encode_sample(
                        s, preds[c], idxs[c]
                    )
                    nibs.append(nib)
                for j in range(0, 8, 2):
                    out.append(nibs[j] | (nibs[j + 1] << 4))
    return bytes(out), block_align


def encode_wav_g711(
    sample_rate: int, channels: list[bytes], law: str
) -> bytes:
    """Spec-valid RIFF/WAVE with G.711 codes: fmt tag 7 (mu-law) or
    6 (A-law), 8 bits per stored sample, one code byte per sample per
    channel, frame-interleaved."""
    tag = {"ulaw": 7, "alaw": 6}[law]
    n = len(channels[0])
    if any(len(c) != n for c in channels):
        raise ValueError("channel code arrays must have equal length")
    nch = len(channels)
    frames = bytearray()
    for j in range(n):
        for c in channels:
            frames.append(c[j])
    # 18-byte fmt (cbSize=0): non-PCM tags carry the extension-size
    # field per the WAVE spec
    fmt = struct.pack(
        "<HHIIHHH", tag, nch, sample_rate, sample_rate * nch, nch, 8, 0
    )
    chunks = [b"fmt " + struct.pack("<I", len(fmt)) + fmt]
    chunks.append(b"data" + struct.pack("<I", len(frames)) + bytes(frames))
    if len(frames) % 2:
        chunks.append(b"\x00")
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_wav_ima_adpcm(
    sample_rate: int,
    channels: list[list[int]],
    samples_per_block: int,
    init_indexes: list[int] | None = None,
) -> bytes:
    """Spec-valid RIFF/WAVE with IMA ADPCM data: fmt tag 0x11, 4 bits
    per sample, cbSize=2 extension carrying wSamplesPerBlock."""
    data, block_align = encode_ima_adpcm(
        channels, samples_per_block, init_indexes
    )
    nch = len(channels)
    avg_bps = (sample_rate * block_align + samples_per_block - 1) // samples_per_block
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, nch, sample_rate, avg_bps, block_align, 4, 2,
        samples_per_block,
    )
    chunks = [b"fmt " + struct.pack("<I", len(fmt)) + fmt]
    chunks.append(b"data" + struct.pack("<I", len(data)) + data)
    if len(data) % 2:
        chunks.append(b"\x00")
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body
