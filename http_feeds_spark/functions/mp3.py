"""MP3 (MPEG Audio Layer III) sample decoder + minimal test encoder.

Implements ISO/IEC 11172-3 (MPEG-1) and 13818-3 (MPEG-2 LSF, incl. the
MPEG-2.5 extension rates) Layer III decoding from the published spec:
header/frame walk, side info, bit reservoir, scalefactors (MPEG-1
scfsi sharing + LSF slen groups), Huffman spectral decode, requantize,
short-block reorder, MS stereo, alias reduction, IMDCT with all four
block-type windows, frequency inversion, and the polyphase synthesis
filterbank. ``decode_mp3`` follows the ``decode_wav`` contract
(multimodal.py:81): (sample_rate, n_channels, mono float64 in [-1, 1]).

PROVENANCE BOUNDARIES (the refuse-loudly contract — each is enforced
with a loud error naming the boundary, never a silent wrong answer):

- **Huffman tables**: Annex B.7's big-value code tables are ~1900
  arbitrary constants. Reproduced here are the tables that pass the
  completeness validation a genuine recollection must pass — a Huffman
  table is a COMPLETE prefix code, so its Kraft sum is exactly 1 and
  no codeword prefixes another; a misremembered entry breaks one or
  both (tests/test_mp3.py pins this for every shipped table). That
  holds for tables 0-3, 5-9, 11-13, 15, both escape-family code
  matrices (16-23 and 24-31 share two matrices with per-table
  linbits), and both count1 quadruple tables — i.e. every table real
  encoders select EXCEPT table 10, whose recollection carried
  multiple internal collisions and is NOT shipped: a frame selecting
  it raises NotImplementedError naming the table. Table 12 is
  recollection plus one pinned completion (see the note at its data).
  Residual risk, stated honestly: completeness cannot rule out a
  same-length code-value swap within a table (the stream would decode
  to a permuted pair); no in-sandbox ground truth exists to refute
  that, and the fingerprint tier consuming this output is
  lossy-tolerant by design.
- **Synthesis window**: the spec's 512-coefficient prototype (Table
  B.3) is likewise non-derivable constant data. The filterbank is
  implemented exactly in the spec's windowed-matrix structure, with an
  in-repo PQMF prototype (Kaiser-windowed ideal lowpass at the
  spec's pi/64 cutoff) whose reconstruction quality is MEASURED and
  pinned (analysis∘synthesis SNR, tests/test_mp3.py). Output is
  therefore not bit-conformant to a reference decoder; band energies
  and spectral peak locations — what the audio fingerprint tier
  (functions/audiofp.py) consumes — are preserved, which that tier's
  lossy-tolerance is designed for.
- Intensity stereo raises (LAME and most encoders default to MS);
  MS stereo and dual/mono are implemented. Free-format bitrate raises.

Wire-level witnesses in tests/test_mp3.py: a REAL LAME 3.98 MPEG-2
stream (the only MP3 in this container — digital silence, so it
exercises the header walk, LSF side info, reservoir and zero-spectrum
pipeline, and must decode to exactly zero samples), hand-packed
MPEG-1 frames whose Huffman bits were computed by hand, and the
encoder twin round-trip with constellation-fingerprint pairing.
"""

from __future__ import annotations

import math

import numpy as np

# --- frame header constants ---------------------------------------------------

BITRATES_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
BITRATES_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
# header version field (2 bits): 3=MPEG-1, 2=MPEG-2, 0=MPEG-2.5
SAMPLE_RATES = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000], 0: [11025, 12000, 8000]}

MODE_STEREO, MODE_JOINT, MODE_DUAL, MODE_MONO = 0, 1, 2, 3

# --- scalefactor bands (Annex B, table B.8 family) ----------------------------
# long: 23 boundaries (22 bands), short: 14 boundaries (13 bands);
# structural invariants (monotone, exact 576/192 ends) pinned in tests.

SFB_LONG = {
    44100: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134, 162, 196, 238, 288, 342, 418, 576],
    48000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128, 156, 190, 230, 276, 330, 384, 576],
    32000: [0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156, 194, 240, 296, 364, 448, 550, 576],
    22050: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168, 200, 238, 284, 336, 396, 464, 522, 576],
    24000: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136, 162, 194, 232, 278, 332, 394, 464, 540, 576],
    16000: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168, 200, 238, 284, 336, 396, 464, 522, 576],
    11025: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168, 200, 238, 284, 336, 396, 464, 522, 576],
    12000: [0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168, 200, 238, 284, 336, 396, 464, 522, 576],
    8000:  [0, 12, 24, 36, 48, 60, 72, 88, 108, 132, 160, 192, 232, 280, 336, 400, 472, 552, 576, 576, 576, 576, 576],
}
SFB_SHORT = {
    44100: [0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192],
    48000: [0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192],
    32000: [0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192],
    22050: [0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192],
    24000: [0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 136, 180, 192],
    16000: [0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192],
    11025: [0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192],
    12000: [0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192],
    8000:  [0, 8, 16, 24, 36, 52, 72, 96, 124, 160, 162, 164, 166, 192],
}

PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0]

# MPEG-1 scalefac_compress -> (slen1, slen2)
SLEN = [
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
]

# --- Huffman tables (Annex B.7) ------------------------------------------------
# (xlen, ylen, linbits, hlen matrix, hcod matrix). Every shipped table is
# validated as a COMPLETE prefix code in tests/test_mp3.py (Kraft sum
# exactly 1, prefix-free) — the property a misremembered constant breaks.

HUFFMAN_TABLES: dict[int, tuple[int, int, int, list[list[int]], list[list[int]]]] = {
    1: (2, 2, 0,
        [[1, 3], [2, 3]],
        [[1, 1], [1, 0]]),
    2: (3, 3, 0,
        [[1, 3, 6], [3, 3, 5], [5, 5, 6]],
        [[1, 2, 1], [3, 1, 1], [3, 2, 0]]),
    3: (3, 3, 0,
        [[2, 2, 6], [3, 2, 5], [5, 5, 6]],
        [[3, 2, 1], [1, 1, 1], [3, 2, 0]]),
    5: (4, 4, 0,
        [[1, 3, 6, 7], [3, 3, 6, 7], [6, 6, 7, 8], [7, 6, 7, 8]],
        [[1, 2, 6, 5], [3, 1, 4, 4], [7, 5, 7, 1], [6, 1, 1, 0]]),
    6: (4, 4, 0,
        [[3, 3, 5, 7], [3, 2, 4, 5], [4, 4, 5, 6], [6, 5, 6, 7]],
        [[7, 3, 5, 1], [6, 2, 3, 2], [5, 4, 4, 1], [3, 3, 2, 0]]),
    7: (6, 6, 0,
        [[1, 3, 6, 8, 8, 9], [3, 4, 6, 7, 7, 8], [6, 5, 7, 8, 8, 9],
         [7, 7, 8, 9, 9, 9], [7, 7, 8, 9, 9, 10], [8, 8, 9, 10, 10, 10]],
        [[1, 2, 10, 19, 16, 10], [3, 3, 7, 10, 5, 3], [11, 4, 13, 17, 8, 4],
         [12, 11, 18, 15, 11, 2], [7, 6, 9, 14, 3, 1], [6, 4, 5, 3, 2, 0]]),
    8: (6, 6, 0,
        [[2, 3, 6, 8, 8, 9], [3, 2, 4, 8, 8, 8], [6, 4, 6, 8, 8, 9],
         [8, 8, 8, 9, 9, 10], [8, 7, 8, 9, 10, 10], [9, 8, 9, 9, 11, 11]],
        [[3, 4, 6, 18, 12, 5], [5, 1, 2, 16, 9, 3], [7, 3, 5, 14, 7, 3],
         [19, 17, 15, 13, 10, 4], [13, 5, 8, 11, 5, 1], [12, 4, 4, 1, 1, 0]]),
    9: (6, 6, 0,
        [[3, 3, 5, 6, 8, 9], [3, 3, 4, 5, 6, 8], [4, 4, 5, 6, 7, 8],
         [6, 5, 6, 7, 7, 8], [7, 6, 7, 7, 8, 9], [8, 7, 8, 8, 9, 9]],
        [[7, 5, 9, 14, 15, 7], [6, 4, 5, 5, 6, 7], [7, 6, 8, 8, 8, 5],
         [15, 6, 9, 10, 5, 1], [11, 7, 9, 6, 4, 1], [14, 4, 6, 2, 6, 0]]),
}

# linbits per escape table id (ISO 11172-3 2.4.2.7: tables 16-23 share
# one code matrix, 24-31 the other; only linbits varies within a family)
LINBITS = {16: 1, 17: 2, 18: 3, 19: 4, 20: 6, 21: 8, 22: 10, 23: 13,
           24: 4, 25: 5, 26: 6, 27: 7, 28: 8, 29: 9, 30: 11, 31: 13}


def _mat(flat: list[int], dim: int) -> list[list[int]]:
    return [list(flat[r * dim : (r + 1) * dim]) for r in range(dim)]


# Tables 11-13, 15 and the two escape-family code matrices (16-23 /
# 24-31), recollected from the public Annex B.7 listings (the same
# (code, length) row-major layout every public encoder/decoder table
# file mirrors) and shipped ONLY because each passes the completeness
# validation independently: 64-256 entries forming a complete prefix
# code (Kraft sum exactly 1, all distinct, prefix-free) — a property
# corrupted recall essentially cannot satisfy by accident, as the
# rejected tables demonstrate (table 10's recollection carried 5+
# internal collisions and stays OUT; a frame selecting it refuses
# loudly). Table 12 is recollection + one pinned completion: 64/64
# codes and 63/64 lengths validated as recalled, with a Kraft deficit
# of exactly 1/512 whose repair is UNIQUE over every possible
# single-length modification (entry (x=6, y=4): 9 -> 8 bits, exactly
# the entry the prefix-overlap implicated); tests/test_mp3.py pins
# both the completeness and the uniqueness argument.
_T11_C = [
    3, 4, 10, 24, 34, 33, 21, 15,
    5, 3, 4, 10, 32, 17, 11, 10,
    11, 7, 13, 18, 30, 31, 20, 5,
    25, 11, 19, 59, 27, 18, 12, 5,
    35, 33, 31, 58, 30, 16, 7, 5,
    28, 26, 32, 19, 17, 15, 8, 14,
    14, 12, 9, 13, 14, 9, 4, 1,
    11, 4, 6, 6, 6, 3, 2, 0]
_T11_L = [
    2, 3, 5, 7, 8, 9, 8, 9,
    3, 3, 4, 6, 8, 8, 7, 8,
    5, 5, 6, 7, 8, 9, 8, 8,
    7, 6, 7, 9, 8, 10, 8, 9,
    8, 8, 8, 9, 9, 10, 9, 10,
    8, 8, 9, 10, 10, 11, 10, 11,
    8, 7, 7, 8, 9, 10, 10, 10,
    8, 7, 8, 9, 10, 10, 10, 10]
_T12_C = [
    9, 6, 16, 33, 41, 39, 38, 26,
    7, 5, 6, 9, 23, 16, 26, 11,
    17, 7, 11, 14, 21, 30, 10, 7,
    17, 10, 15, 12, 18, 28, 14, 5,
    32, 13, 22, 19, 18, 16, 9, 5,
    40, 17, 31, 29, 17, 13, 4, 2,
    27, 12, 11, 15, 10, 7, 4, 1,
    27, 12, 8, 12, 6, 3, 1, 0]
_T12_L = [
    4, 3, 5, 7, 8, 9, 9, 9,
    3, 3, 4, 5, 7, 7, 8, 8,
    5, 4, 5, 6, 7, 8, 7, 8,
    6, 5, 6, 6, 7, 8, 8, 8,
    7, 6, 7, 7, 8, 8, 8, 9,
    8, 7, 8, 8, 8, 9, 8, 9,
    8, 7, 7, 8, 8, 9, 9, 10,  # (6,4): the unique 9->8 completion
    9, 8, 8, 9, 9, 9, 9, 10]
_T13_C = [
    1, 5, 14, 21, 34, 51, 46, 71, 42, 52, 68, 52, 67, 44, 43, 19,
    3, 4, 12, 19, 31, 26, 44, 33, 31, 24, 32, 24, 31, 35, 22, 14,
    15, 13, 23, 36, 59, 49, 77, 65, 29, 40, 30, 40, 27, 33, 42, 16,
    22, 20, 37, 61, 56, 79, 73, 64, 43, 76, 56, 37, 26, 31, 25, 14,
    35, 16, 60, 57, 97, 75, 114, 91, 54, 73, 55, 41, 48, 53, 23, 24,
    58, 27, 50, 96, 76, 70, 93, 84, 77, 58, 79, 29, 74, 49, 41, 17,
    47, 45, 78, 74, 115, 94, 90, 79, 69, 83, 71, 50, 59, 38, 36, 15,
    72, 34, 56, 95, 92, 85, 91, 90, 86, 73, 77, 65, 51, 44, 43, 42,
    43, 20, 30, 44, 55, 78, 72, 87, 78, 61, 46, 54, 37, 30, 20, 16,
    53, 25, 41, 37, 44, 59, 54, 81, 66, 76, 57, 54, 37, 18, 39, 11,
    35, 33, 31, 57, 42, 82, 72, 80, 47, 58, 55, 21, 22, 26, 38, 22,
    53, 25, 23, 38, 70, 60, 51, 36, 55, 26, 34, 23, 27, 14, 9, 7,
    34, 32, 28, 39, 49, 75, 30, 52, 48, 40, 52, 28, 18, 17, 9, 5,
    45, 21, 34, 64, 56, 50, 49, 45, 31, 19, 12, 15, 10, 7, 6, 3,
    48, 23, 20, 39, 36, 35, 53, 21, 16, 23, 13, 10, 6, 1, 4, 2,
    16, 15, 17, 27, 25, 20, 29, 11, 17, 12, 16, 8, 1, 1, 0, 1]
_T13_L = [
    1, 4, 6, 7, 8, 9, 9, 10, 9, 10, 11, 11, 12, 12, 13, 13,
    3, 4, 6, 7, 8, 8, 9, 9, 9, 9, 10, 10, 11, 12, 12, 12,
    6, 6, 7, 8, 9, 9, 10, 10, 9, 10, 10, 11, 11, 12, 13, 13,
    7, 7, 8, 9, 9, 10, 10, 10, 10, 11, 11, 11, 11, 12, 13, 13,
    8, 7, 9, 9, 10, 10, 11, 11, 10, 11, 11, 12, 12, 13, 13, 14,
    9, 8, 9, 10, 10, 10, 11, 11, 11, 11, 12, 11, 13, 13, 14, 14,
    9, 9, 10, 10, 11, 11, 11, 11, 11, 12, 12, 12, 13, 13, 14, 14,
    10, 9, 10, 11, 11, 11, 12, 12, 12, 12, 13, 13, 13, 14, 16, 16,
    9, 8, 9, 10, 10, 11, 11, 12, 12, 12, 12, 13, 13, 14, 15, 15,
    10, 9, 10, 10, 11, 11, 11, 13, 12, 13, 13, 14, 14, 14, 16, 15,
    10, 10, 10, 11, 11, 12, 12, 13, 12, 13, 14, 13, 14, 15, 16, 17,
    11, 10, 10, 11, 12, 12, 12, 12, 13, 13, 13, 14, 15, 15, 15, 16,
    11, 11, 11, 12, 12, 13, 12, 13, 14, 14, 15, 15, 15, 16, 16, 16,
    12, 11, 12, 13, 13, 13, 14, 14, 14, 14, 14, 15, 16, 15, 16, 16,
    13, 12, 12, 13, 13, 13, 15, 14, 14, 17, 15, 15, 15, 17, 16, 16,
    12, 12, 13, 14, 14, 14, 15, 14, 15, 15, 16, 16, 19, 18, 19, 16]
_T15_C = [
    7, 12, 18, 53, 47, 76, 124, 108, 89, 123, 108, 119, 107, 81, 122, 63,
    13, 5, 16, 27, 46, 36, 61, 51, 42, 70, 52, 83, 65, 41, 59, 36,
    19, 17, 15, 24, 41, 34, 59, 48, 40, 64, 50, 78, 62, 80, 56, 33,
    29, 28, 25, 43, 39, 63, 55, 93, 76, 59, 93, 72, 54, 75, 50, 29,
    52, 22, 42, 40, 67, 57, 95, 79, 72, 57, 89, 69, 49, 66, 46, 27,
    77, 37, 35, 66, 58, 52, 91, 74, 62, 48, 79, 63, 90, 62, 40, 38,
    125, 32, 60, 56, 50, 92, 78, 65, 55, 87, 71, 51, 73, 51, 70, 30,
    109, 53, 49, 94, 88, 75, 66, 122, 91, 73, 56, 42, 64, 44, 21, 25,
    90, 43, 41, 77, 73, 63, 56, 92, 77, 66, 47, 67, 48, 53, 36, 20,
    71, 34, 67, 60, 58, 49, 88, 76, 67, 106, 71, 54, 38, 39, 23, 15,
    109, 53, 51, 47, 90, 82, 58, 57, 48, 72, 57, 41, 23, 27, 62, 9,
    86, 42, 40, 37, 70, 64, 52, 43, 70, 55, 42, 25, 29, 18, 11, 11,
    118, 68, 30, 55, 50, 46, 74, 65, 49, 39, 24, 16, 22, 13, 14, 7,
    91, 44, 39, 38, 34, 63, 52, 45, 31, 52, 28, 19, 14, 8, 9, 3,
    123, 60, 58, 53, 47, 43, 32, 22, 37, 24, 17, 12, 15, 10, 2, 1,
    71, 37, 34, 30, 28, 20, 17, 26, 21, 16, 10, 6, 8, 6, 2, 0]
_T15_L = [
    3, 4, 5, 7, 7, 8, 9, 9, 9, 10, 10, 11, 11, 11, 12, 13,
    4, 3, 5, 6, 7, 7, 8, 8, 8, 9, 9, 10, 10, 10, 11, 11,
    5, 5, 5, 6, 7, 7, 8, 8, 8, 9, 9, 10, 10, 11, 11, 11,
    6, 6, 6, 7, 7, 8, 8, 9, 9, 9, 10, 10, 10, 11, 11, 11,
    7, 6, 7, 7, 8, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 11,
    8, 7, 7, 8, 8, 8, 9, 9, 9, 9, 10, 10, 11, 11, 11, 12,
    9, 7, 8, 8, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 12, 12,
    9, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 11, 12,
    9, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 11, 11, 12, 12, 12,
    9, 8, 9, 9, 9, 9, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12,
    10, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 11, 11, 12, 13, 12,
    10, 9, 9, 9, 10, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12, 13,
    11, 10, 9, 10, 10, 10, 11, 11, 11, 11, 11, 11, 12, 12, 13, 13,
    11, 10, 10, 10, 10, 11, 11, 11, 11, 12, 12, 12, 12, 12, 13, 13,
    12, 11, 11, 11, 11, 11, 11, 11, 12, 12, 12, 12, 13, 13, 12, 13,
    12, 11, 11, 11, 11, 11, 11, 12, 12, 12, 12, 12, 13, 13, 13, 13]
_T16_C = [
    1, 5, 14, 44, 74, 63, 110, 93, 172, 149, 138, 242, 225, 195, 376, 17,
    3, 4, 12, 20, 35, 62, 53, 47, 83, 75, 68, 119, 201, 107, 207, 9,
    15, 13, 23, 38, 67, 58, 103, 90, 161, 72, 127, 117, 110, 209, 206, 16,
    45, 21, 39, 69, 64, 114, 99, 87, 158, 140, 252, 212, 199, 387, 365, 26,
    75, 36, 68, 65, 115, 101, 179, 164, 155, 264, 246, 226, 395, 382, 362, 9,
    66, 30, 59, 56, 102, 185, 173, 265, 142, 253, 232, 400, 388, 378, 445, 16,
    111, 54, 52, 100, 184, 178, 160, 133, 257, 244, 228, 217, 385, 366, 715, 10,
    98, 48, 91, 88, 165, 157, 148, 261, 248, 407, 397, 372, 380, 889, 884, 8,
    85, 84, 81, 159, 156, 143, 260, 249, 427, 401, 392, 383, 727, 713, 708, 7,
    154, 76, 73, 141, 131, 256, 245, 426, 406, 394, 384, 735, 359, 710, 352, 11,
    139, 129, 67, 125, 247, 233, 229, 219, 393, 743, 737, 720, 885, 882, 439, 4,
    243, 120, 118, 115, 227, 223, 396, 746, 742, 736, 721, 712, 706, 223, 436, 6,
    202, 224, 222, 218, 216, 389, 386, 381, 364, 888, 443, 707, 440, 437, 1728, 4,
    747, 211, 210, 208, 370, 379, 734, 723, 714, 1735, 883, 877, 876, 3459, 865, 2,
    377, 369, 102, 187, 726, 722, 358, 711, 709, 866, 1734, 871, 3458, 870, 434, 0,
    12, 10, 7, 11, 10, 17, 11, 9, 13, 12, 10, 7, 5, 3, 1, 3]
_T16_L = [
    1, 4, 6, 8, 9, 9, 10, 10, 11, 11, 11, 12, 12, 12, 13, 9,
    3, 4, 6, 7, 8, 9, 9, 9, 10, 10, 10, 11, 12, 11, 12, 8,
    6, 6, 7, 8, 9, 9, 10, 10, 11, 10, 11, 11, 11, 12, 12, 9,
    8, 7, 8, 9, 9, 10, 10, 10, 11, 11, 12, 12, 12, 13, 13, 10,
    9, 8, 9, 9, 10, 10, 11, 11, 11, 12, 12, 12, 13, 13, 13, 9,
    9, 8, 9, 9, 10, 11, 11, 12, 11, 12, 12, 13, 13, 13, 14, 10,
    10, 9, 9, 10, 11, 11, 11, 11, 12, 12, 12, 12, 13, 13, 14, 10,
    10, 9, 10, 10, 11, 11, 11, 12, 12, 13, 13, 13, 13, 15, 15, 10,
    10, 10, 10, 11, 11, 11, 12, 12, 13, 13, 13, 13, 14, 14, 14, 10,
    11, 10, 10, 11, 11, 12, 12, 13, 13, 13, 13, 14, 13, 14, 13, 11,
    11, 11, 10, 11, 12, 12, 12, 12, 13, 14, 14, 14, 15, 15, 14, 10,
    12, 11, 11, 11, 12, 12, 13, 14, 14, 14, 14, 14, 14, 13, 14, 11,
    12, 12, 12, 12, 12, 13, 13, 13, 13, 15, 14, 14, 14, 14, 16, 11,
    14, 12, 12, 12, 13, 13, 14, 14, 14, 16, 15, 15, 15, 17, 15, 11,
    13, 13, 11, 12, 14, 14, 13, 14, 14, 15, 16, 15, 17, 15, 14, 11,
    9, 8, 8, 9, 9, 10, 10, 10, 11, 11, 11, 11, 11, 11, 11, 8]
_T24_C = [
    15, 13, 46, 80, 146, 262, 248, 434, 426, 669, 653, 649, 621, 517, 1032, 88,
    14, 12, 21, 38, 71, 130, 122, 216, 209, 198, 327, 345, 319, 297, 279, 42,
    47, 22, 41, 74, 68, 128, 120, 221, 207, 194, 182, 340, 315, 295, 541, 18,
    81, 39, 75, 70, 134, 125, 116, 220, 204, 190, 178, 325, 311, 293, 271, 16,
    147, 72, 69, 135, 127, 118, 112, 210, 200, 188, 352, 323, 306, 285, 540, 14,
    263, 66, 129, 126, 119, 114, 214, 202, 192, 180, 341, 317, 301, 281, 262, 12,
    249, 123, 121, 117, 113, 215, 206, 195, 185, 347, 330, 308, 291, 272, 520, 10,
    435, 115, 111, 109, 211, 203, 196, 187, 353, 332, 313, 298, 283, 531, 381, 17,
    427, 212, 208, 205, 201, 193, 186, 177, 169, 320, 303, 286, 268, 514, 377, 16,
    335, 199, 197, 191, 189, 181, 174, 333, 321, 305, 289, 275, 521, 379, 371, 11,
    668, 184, 183, 179, 175, 344, 331, 314, 304, 290, 277, 530, 383, 373, 366, 10,
    652, 346, 171, 168, 164, 318, 309, 299, 287, 276, 263, 513, 375, 368, 362, 6,
    648, 322, 316, 312, 307, 302, 292, 284, 269, 261, 512, 376, 370, 364, 359, 4,
    620, 300, 296, 294, 288, 282, 273, 266, 515, 380, 374, 369, 365, 361, 357, 2,
    1033, 280, 278, 274, 267, 264, 259, 382, 378, 372, 367, 363, 360, 358, 356, 0,
    43, 20, 19, 17, 15, 13, 11, 9, 7, 6, 4, 7, 5, 3, 1, 3]
_T24_L = [
    4, 4, 6, 7, 8, 9, 9, 10, 10, 11, 11, 11, 11, 11, 12, 9,
    4, 4, 5, 6, 7, 8, 8, 9, 9, 9, 10, 10, 10, 10, 10, 8,
    6, 5, 6, 7, 7, 8, 8, 9, 9, 9, 9, 10, 10, 10, 11, 7,
    7, 6, 7, 7, 8, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 7,
    8, 7, 7, 8, 8, 8, 8, 9, 9, 9, 10, 10, 10, 10, 11, 7,
    9, 7, 8, 8, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 10, 7,
    9, 8, 8, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 10, 11, 7,
    10, 8, 8, 8, 9, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 8,
    10, 9, 9, 9, 9, 9, 9, 9, 9, 10, 10, 10, 10, 11, 11, 8,
    10, 9, 9, 9, 9, 9, 9, 10, 10, 10, 10, 10, 11, 11, 11, 8,
    11, 9, 9, 9, 9, 10, 10, 10, 10, 10, 10, 11, 11, 11, 11, 8,
    11, 10, 9, 9, 9, 10, 10, 10, 10, 10, 10, 11, 11, 11, 11, 8,
    11, 10, 10, 10, 10, 10, 10, 10, 10, 10, 11, 11, 11, 11, 11, 8,
    11, 10, 10, 10, 10, 10, 10, 10, 11, 11, 11, 11, 11, 11, 11, 8,
    12, 10, 10, 10, 10, 10, 10, 11, 11, 11, 11, 11, 11, 11, 11, 8,
    8, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 8, 8, 8, 8, 4]

HUFFMAN_TABLES[11] = (8, 8, 0, _mat(_T11_L, 8), _mat(_T11_C, 8))
HUFFMAN_TABLES[12] = (8, 8, 0, _mat(_T12_L, 8), _mat(_T12_C, 8))
HUFFMAN_TABLES[13] = (16, 16, 0, _mat(_T13_L, 16), _mat(_T13_C, 16))
HUFFMAN_TABLES[15] = (16, 16, 0, _mat(_T15_L, 16), _mat(_T15_C, 16))
for _tid in LINBITS:
    _l, _c = (_T16_L, _T16_C) if _tid < 24 else (_T24_L, _T24_C)
    HUFFMAN_TABLES[_tid] = (16, 16, LINBITS[_tid], _mat(_l, 16), _mat(_c, 16))

# count1 quadruple tables: table A (count1table_select=0), B (=1).
# A: (hlen, hcod) per vwxy value 0..15; B: fixed 4-bit complement code.
COUNT1_A = (
    [1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6],
    [1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1],
)
COUNT1_B = ([4] * 16, [15 - i for i in range(16)])

SUPPORTED_TABLES = frozenset({0} | set(HUFFMAN_TABLES))


def _decode_tree(hlen: list[list[int]], hcod: list[list[int]]) -> dict[str, tuple[int, int]]:
    out = {}
    for x, row in enumerate(hlen):
        for y, ln in enumerate(row):
            out[format(hcod[x][y], f"0{ln}b")] = (x, y)
    return out


_TREES = {tid: _decode_tree(t[3], t[4]) for tid, t in HUFFMAN_TABLES.items()}
_C1_TREES = {
    0: {format(c, f"0{l}b"): v for v, (l, c) in enumerate(zip(*COUNT1_A))},
    1: {format(c, f"0{l}b"): v for v, (l, c) in enumerate(zip(*COUNT1_B))},
}


class _Bits:
    """MSB-first bit reader. Reads past the end of ``data`` raise the
    named ValueError of the loud-error contract (a torn granule whose
    part2_3_length exceeds the available reservoir+main bytes must not
    surface as an anonymous IndexError)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        v = 0
        d, p = self.data, self.pos
        if p + n > self.nbits:
            raise ValueError("bit read past end of main data (torn granule)")
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def read1(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise ValueError("bit read past end of main data (torn granule)")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1


def _huff_symbol(bits: _Bits, tree: dict, limit: int):
    code = ""
    while bits.pos < limit:
        code += "1" if bits.read1() else "0"
        hit = tree.get(code)
        if hit is not None:
            return hit
        if len(code) > 19:
            break
    raise ValueError("Huffman desync (invalid code or truncated granule)")


# --- frame / side info parsing -------------------------------------------------


def skip_id3(payload: bytes) -> int:
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = (payload[6] << 21) | (payload[7] << 14) | (payload[8] << 7) | payload[9]
        return 10 + size
    return 0


def parse_header(h: bytes) -> dict | None:
    """Parse a 4-byte frame header; None when not a Layer III sync."""
    if len(h) < 4 or h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
        return None
    version = (h[1] >> 3) & 3
    layer = (h[1] >> 1) & 3
    if version == 1 or layer != 1:  # reserved version / not Layer III
        return None
    bri = (h[2] >> 4) & 15
    sri = (h[2] >> 2) & 3
    if bri == 15 or sri == 3:
        return None
    if bri == 0:
        raise NotImplementedError("free-format bitrate is a documented boundary")
    mpeg1 = version == 3
    bitrate = (BITRATES_V1_L3 if mpeg1 else BITRATES_V2_L3)[bri] * 1000
    rate = SAMPLE_RATES[version][sri]
    pad = (h[2] >> 1) & 1
    mode = (h[3] >> 6) & 3
    mode_ext = (h[3] >> 4) & 3
    frame_len = (144000 if mpeg1 else 72000) * (bitrate // 1000) // rate + pad
    return {
        "mpeg1": mpeg1,
        "bitrate": bitrate,
        "rate": rate,
        "padding": pad,
        "protection": (h[1] & 1) == 0,
        "mode": mode,
        "mode_ext": mode_ext,
        "nch": 1 if mode == MODE_MONO else 2,
        "frame_len": frame_len,
        "ngr": 2 if mpeg1 else 1,
        "samples": 1152 if mpeg1 else 576,
    }


def _parse_side_info(bits: _Bits, hdr: dict) -> dict:
    nch, mpeg1 = hdr["nch"], hdr["mpeg1"]
    si: dict = {}
    if mpeg1:
        si["main_data_begin"] = bits.read(9)
        bits.read(5 if nch == 1 else 3)  # private
        si["scfsi"] = [[bits.read1() for _ in range(4)] for _ in range(nch)]
    else:
        si["main_data_begin"] = bits.read(8)
        bits.read(1 if nch == 1 else 2)
        si["scfsi"] = [[0] * 4 for _ in range(nch)]
    grs = []
    for _ in range(hdr["ngr"]):
        chs = []
        for _ch in range(nch):
            g: dict = {}
            g["part2_3_length"] = bits.read(12)
            g["big_values"] = bits.read(9)
            g["global_gain"] = bits.read(8)
            g["scalefac_compress"] = bits.read(4 if mpeg1 else 9)
            if bits.read1():  # window_switching_flag
                g["block_type"] = bits.read(2)
                g["mixed_block"] = bits.read1()
                g["table_select"] = [bits.read(5), bits.read(5), 0]
                g["subblock_gain"] = [bits.read(3) for _ in range(3)]
                if g["block_type"] == 0:
                    raise ValueError("window switching with block_type 0 is forbidden")
                # implicit region counts under window switching — the
                # de-facto decoder convention (dist10 III_get_side_info,
                # pdmp3 Read_Side_Info): 8 for pure-short block_type 2,
                # 7 otherwise (mixed and long types 1/3), region1 the
                # complement to 20
                r0c = 8 if g["block_type"] == 2 and not g["mixed_block"] else 7
                g["region0_count"] = r0c
                g["region1_count"] = 20 - r0c
            else:
                g["block_type"] = 0
                g["mixed_block"] = 0
                g["table_select"] = [bits.read(5), bits.read(5), bits.read(5)]
                g["subblock_gain"] = [0, 0, 0]
                g["region0_count"] = bits.read(4)
                g["region1_count"] = bits.read(3)
            g["preflag"] = bits.read1() if mpeg1 else 0
            g["scalefac_scale"] = bits.read1()
            g["count1table_select"] = bits.read1()
            chs.append(g)
        grs.append(chs)
    si["granules"] = grs
    return si


def iter_frames(payload: bytes):
    """Yield (header, side_info, main_data_bytes) per frame — resync on
    garbage between frames (ID3v1/v2, LAME tag padding ride along in
    the reservoir bytes as the spec intends)."""
    pos = skip_id3(payload)
    n = len(payload)
    yielded = False
    saw_free_format = False
    while pos + 4 <= n:
        try:
            hdr = parse_header(payload[pos : pos + 4])
        except NotImplementedError:
            # bitrate-index 0 at a sync candidate: a genuinely
            # free-format stream never parses ANY frame (every real
            # header carries bri==0), so the boundary raise is deferred
            # to the end — a FALSE sync inside inter-frame garbage must
            # resync like any other non-frame byte, not abort the decode
            saw_free_format = True
            pos += 1
            continue
        if hdr is None:
            pos += 1
            continue
        end = pos + hdr["frame_len"]
        if end > n:
            break
        body_start = pos + 4 + (2 if hdr["protection"] else 0)
        si_len = (
            (17 if hdr["nch"] == 1 else 32)
            if hdr["mpeg1"]
            else (9 if hdr["nch"] == 1 else 17)
        )
        si = _parse_side_info(_Bits(payload[body_start : body_start + si_len]), hdr)
        main = payload[body_start + si_len : end]
        yield hdr, si, main
        yielded = True
        pos = end
    if saw_free_format and not yielded:
        raise NotImplementedError("free-format bitrate is a documented boundary")


# --- scalefactors ---------------------------------------------------------------


def _read_scalefactors_mpeg1(bits, g, scfsi, prev_sf):
    slen1, slen2 = SLEN[g["scalefac_compress"]]
    if g["block_type"] == 2:
        sf_s = [[0] * 3 for _ in range(13)]
        if g["mixed_block"]:
            sf_l = [0] * 22
            for sfb in range(8):
                sf_l[sfb] = bits.read(slen1)
            for sfb in range(3, 6):
                for w in range(3):
                    sf_s[sfb][w] = bits.read(slen1)
            for sfb in range(6, 12):
                for w in range(3):
                    sf_s[sfb][w] = bits.read(slen2)
            return sf_l, sf_s
        for sfb in range(6):
            for w in range(3):
                sf_s[sfb][w] = bits.read(slen1)
        for sfb in range(6, 12):
            for w in range(3):
                sf_s[sfb][w] = bits.read(slen2)
        return [0] * 22, sf_s
    # long blocks: scfsi groups 0-5, 6-10, 11-15, 16-20
    sf_l = [0] * 22
    groups = [(0, 6, slen1), (6, 11, slen1), (11, 16, slen2), (16, 21, slen2)]
    for gi, (lo, hi, sl) in enumerate(groups):
        if scfsi[gi] and prev_sf is not None:
            for sfb in range(lo, hi):
                sf_l[sfb] = prev_sf[sfb]
        else:
            for sfb in range(lo, hi):
                sf_l[sfb] = bits.read(sl)
    return sf_l, [[0] * 3 for _ in range(13)]


def _lsf_slen_blocks(g) -> tuple[list[int], list[int], int]:
    """MPEG-2 LSF scalefactor layout (13818-3 §2.4.3.2, non-intensity):
    scalefac_compress -> 4 slen widths + 4 block lengths + preflag."""
    sfc = g["scalefac_compress"]
    short = g["block_type"] == 2  # mixed already refused by the caller
    preflag = 0
    if sfc < 400:
        slen = [(sfc >> 4) // 5, (sfc >> 4) % 5, (sfc % 16) >> 2, sfc % 4]
        nr = [9, 9, 9, 9] if short else [6, 5, 5, 5]
    elif sfc < 500:
        s = sfc - 400
        slen = [(s >> 2) // 5, (s >> 2) % 5, s % 4, 0]
        nr = [9, 9, 12, 6] if short else [6, 5, 7, 3]
    else:
        s = sfc - 500
        slen = [s // 3, s % 3, 0, 0]
        nr = [18, 18, 0, 0] if short else [11, 10, 0, 0]
        preflag = 1
    return slen, nr, preflag


def _read_scalefactors_lsf(bits, g):
    if g["block_type"] == 2 and g["mixed_block"]:
        # the LSF mixed-block slen group lengths are a further spec
        # constant table this module does not reproduce — refuse loudly
        # rather than silently mis-partition the scalefactor bits
        raise NotImplementedError("LSF mixed-block scalefactors are a documented boundary")
    slen, nr, preflag = _lsf_slen_blocks(g)
    vals: list[int] = []
    for width, count in zip(slen, nr):
        for _ in range(count):
            vals.append(bits.read(width) if width else 0)
    if g["block_type"] == 2 and not g["mixed_block"]:
        sf_s = [[0] * 3 for _ in range(13)]
        i = 0
        for sfb in range(12):
            for w in range(3):
                if i < len(vals):
                    sf_s[sfb][w] = vals[i]
                i += 1
        return [0] * 22, sf_s, preflag
    sf_l = [0] * 22
    for sfb in range(min(21, len(vals))):
        sf_l[sfb] = vals[sfb]
    return sf_l, [[0] * 3 for _ in range(13)], preflag


# --- Huffman spectral decode -----------------------------------------------------


def _decode_big_value(bits, tid: int, limit: int) -> tuple[int, int]:
    if tid == 0:
        return 0, 0
    if tid not in SUPPORTED_TABLES:
        raise NotImplementedError(
            f"Huffman table {tid} is outside the validated set "
            f"{sorted(SUPPORTED_TABLES)} (see functions/mp3.py docstring)"
        )
    x, y = _huff_symbol(bits, _TREES[tid], limit)
    # escape coding (tables 16-31): symbol 15 carries a linbits-wide
    # unsigned extension, then the sign bit as usual
    lin = HUFFMAN_TABLES[tid][2]
    if lin and x == 15:
        x += bits.read(lin)
    if x and bits.read1():
        x = -x
    if lin and y == 15:
        y += bits.read(lin)
    if y and bits.read1():
        y = -y
    return x, y


def _region_boundaries(hdr, g) -> tuple[int, int]:
    band = SFB_LONG[hdr["rate"]]
    if g["block_type"] == 2:
        # short blocks, pure and mixed: region1 at line 36, no region2
        # (dist10 III_hufman_decode / pdmp3 Read_Huffman)
        return 36, 576
    # long blocks — including window-switched types 1/3, whose implicit
    # region0_count=7 puts the boundary at band[8]: 36 only where the
    # MPEG-1 tables happen to have band[8]==36, 54/108 at LSF rates
    r0 = band[min(g["region0_count"] + 1, 22)]
    r1 = band[min(g["region0_count"] + 1 + g["region1_count"] + 1, 22)]
    return r0, r1


def _decode_spectrum(bits, hdr, g, limit: int) -> np.ndarray:
    """Huffman-decode one granule's 576 quantized values, consuming
    exactly up to part2_3_length (the spec's bit-accounting contract)."""
    is_q = np.zeros(576, dtype=np.int32)
    r0, r1 = _region_boundaries(hdr, g)
    for pair in range(g["big_values"]):
        lin_idx = pair * 2
        if lin_idx >= 576:
            raise ValueError("big_values overruns 576 coefficients")
        region = 0 if lin_idx < r0 else (1 if lin_idx < r1 else 2)
        tid = g["table_select"][region]
        x, y = _decode_big_value(bits, tid, limit)
        is_q[lin_idx] = x
        is_q[lin_idx + 1] = y
    if bits.pos > limit:
        raise ValueError(
            f"big-value data overran part2_3_length by {bits.pos - limit} bits"
        )
    # count1 region: quads until the bit budget is exhausted. Encoders
    # commonly let the LAST quad's codeword straddle the budget end
    # (padding semantics) — the published decoder behavior is to roll
    # that quad back, not to fail the granule.
    tree = _C1_TREES[g["count1table_select"]]
    pos = g["big_values"] * 2
    while bits.pos < limit and pos + 4 <= 576:
        mark = bits.pos
        try:
            v = _huff_symbol(bits, tree, limit)
            quad = [(v >> 3) & 1, (v >> 2) & 1, (v >> 1) & 1, v & 1]
            for k in range(4):
                if quad[k]:
                    if bits.pos >= limit:
                        raise ValueError("count1 sign past budget")
                    quad[k] = -1 if bits.read1() else 1
        except ValueError:
            bits.pos = mark
            break
        is_q[pos : pos + 4] = quad
        pos += 4
    return is_q


# --- requantize / reorder / stereo / antialias ------------------------------------


def _requantize(hdr, g, sf_l, sf_s, preflag, is_q: np.ndarray) -> np.ndarray:
    rate = hdr["rate"]
    xr = np.sign(is_q) * (np.abs(is_q).astype(np.float64) ** (4.0 / 3.0))
    gain = 2.0 ** ((g["global_gain"] - 210) / 4.0)
    mult = 1.0 if g["scalefac_scale"] else 0.5
    scale = np.empty(576)
    if g["block_type"] == 2 and not g["mixed_block"]:
        band = SFB_SHORT[rate]
        for sfb in range(13):
            lo, hi = band[sfb], band[sfb + 1]
            w_len = hi - lo
            for w in range(3):
                s = lo * 3 + w * w_len
                sub = 2.0 ** (-8.0 * g["subblock_gain"][w] / 4.0)
                sc = 2.0 ** (-mult * sf_s[min(sfb, 12)][w])
                scale[s : s + w_len] = gain * sub * sc
    else:
        band = SFB_LONG[rate]
        for sfb in range(22):
            lo, hi = band[sfb], band[sfb + 1]
            pre = PRETAB[sfb] if preflag else 0
            scale[lo:hi] = gain * 2.0 ** (-mult * (sf_l[sfb] + pre))
        if g["block_type"] == 2 and g["mixed_block"]:
            # mixed: first 36 coefficients long-scaled above; short bands
            # from sfb 3 rescale the tail
            sband = SFB_SHORT[rate]
            for sfb in range(3, 13):
                lo, hi = sband[sfb], sband[sfb + 1]
                w_len = hi - lo
                for w in range(3):
                    s = lo * 3 + w * w_len
                    if s < 36:
                        continue
                    sub = 2.0 ** (-8.0 * g["subblock_gain"][w] / 4.0)
                    sc = 2.0 ** (-mult * sf_s[min(sfb, 12)][w])
                    scale[s : s + w_len] = gain * sub * sc
    return xr * scale


def _reorder_short(hdr, g, xr: np.ndarray) -> np.ndarray:
    """Short-block reorder: from (sfb, window, line) wire order to
    window-interleaved line order the IMDCT consumes."""
    if g["block_type"] != 2:
        return xr
    band = SFB_SHORT[hdr["rate"]]
    out = xr.copy()
    start_sfb = 3 if g["mixed_block"] else 0
    for sfb in range(start_sfb, 13):
        lo, hi = band[sfb], band[sfb + 1]
        w_len = hi - lo
        base = lo * 3
        if base >= 576:
            break
        block = xr[base : base + 3 * w_len]
        if len(block) < 3 * w_len:
            break
        re = np.empty_like(block)
        for w in range(3):
            re[w::3] = block[w * w_len : (w + 1) * w_len]
        out[base : base + 3 * w_len] = re
    return out


_AA_CI = np.array([-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037])
_AA_CS = 1.0 / np.sqrt(1.0 + _AA_CI**2)
_AA_CA = _AA_CI / np.sqrt(1.0 + _AA_CI**2)


def _antialias(g, xr: np.ndarray) -> np.ndarray:
    if g["block_type"] == 2 and not g["mixed_block"]:
        return xr
    n_sb = 2 if (g["block_type"] == 2 and g["mixed_block"]) else 32
    out = xr.copy()
    for sb in range(1, n_sb):
        for i in range(8):
            lo = sb * 18 - 1 - i
            hi = sb * 18 + i
            a, b = out[lo], out[hi]
            out[lo] = a * _AA_CS[i] - b * _AA_CA[i]
            out[hi] = b * _AA_CS[i] + a * _AA_CA[i]
    return out


# --- IMDCT + windows + overlap-add --------------------------------------------------


def _imdct_matrix(n: int) -> np.ndarray:
    i = np.arange(n)[:, None]
    k = np.arange(n // 2)[None, :]
    return np.cos(np.pi / (2 * n) * (2 * i + 1 + n / 2) * (2 * k + 1))


_IMDCT36 = _imdct_matrix(36)
_IMDCT12 = _imdct_matrix(12)


def _block_window(block_type: int) -> np.ndarray:
    i = np.arange(36)
    w = np.sin(np.pi / 36 * (i + 0.5))
    if block_type == 1:
        w = w.copy()
        w[18:24] = 1.0
        w[24:30] = np.sin(np.pi / 12 * (i[24:30] - 18 + 0.5))
        w[30:] = 0.0
    elif block_type == 3:
        w = w.copy()
        w[:6] = 0.0
        w[6:12] = np.sin(np.pi / 12 * (i[6:12] - 6 + 0.5))
        w[12:18] = 1.0
    return w


_WIN_LONG = {bt: _block_window(bt) for bt in (0, 1, 3)}
_WIN_SHORT = np.sin(np.pi / 12 * (np.arange(12) + 0.5))


def _hybrid_synthesis(g, xr: np.ndarray, overlap: np.ndarray) -> np.ndarray:
    """Per-subband IMDCT + window + overlap-add. Returns (32, 18) subband
    time samples; mutates `overlap` (32, 18) state."""
    out = np.empty((32, 18))
    for sb in range(32):
        X = xr[sb * 18 : (sb + 1) * 18]
        long_block = g["block_type"] != 2 or (g["mixed_block"] and sb < 2)
        if long_block:
            bt = g["block_type"] if not (g["mixed_block"] and sb < 2) else 0
            if g["block_type"] != 2:
                bt = g["block_type"]
            z = (_IMDCT36 @ X) * _WIN_LONG.get(bt, _WIN_LONG[0])
        else:
            z = np.zeros(36)
            for w in range(3):
                zi = (_IMDCT12 @ X[w::3]) * _WIN_SHORT
                z[6 + 6 * w : 18 + 6 * w] += zi
        out[sb] = z[:18] + overlap[sb]
        overlap[sb] = z[18:]
    return out


# --- synthesis polyphase filterbank ---------------------------------------------------


def _design_prototype() -> np.ndarray:
    """In-repo PQMF prototype (see module docstring): frequency-sampled
    square-root-raised-cosine lowpass crossing at the spec filterbank's
    pi/64 — T(fc+d)^2 + T(fc-d)^2 = 1 at the band crossover, the
    pseudo-QMF power-complementarity the spec prototype satisfies.
    Reconstruction SNR measured and pinned in tests/test_mp3.py."""
    fc = 1.0 / 128.0
    w = 1.0 / 128.0
    M = 1 << 14
    f = np.arange(M + 1) / (1 << 16)
    t2 = np.zeros_like(f)
    t2[f <= fc - w] = 1.0
    mid = (f > fc - w) & (f < fc + w)
    t2[mid] = 0.5 * (1 + np.cos(np.pi * (f[mid] - (fc - w)) / (2 * w)))
    T = np.sqrt(t2)
    n = np.arange(512)
    df = f[1] - f[0]
    h = 2 * (np.cos(2 * np.pi * np.outer(n - 255.5, f)) @ T) * df
    return h / h.sum()


_PROTO = _design_prototype()
# The matrixing cosines are 128-periodic in the tap index while the
# spec's 8-term window fold is 64-periodic; the spec bakes the
# compensating (-1)^(i//64) alternation into its C/D tables — applied
# here to the prototype explicitly.
_FOLD_SIGN = (-1.0) ** (np.arange(512) // 64)
_SYN_MAT = np.cos((16 + np.arange(64))[:, None] * (2 * np.arange(32)[None, :] + 1) * np.pi / 64)
_ANA_MAT = np.cos((2 * np.arange(32)[:, None] + 1) * (np.arange(64)[None, :] - 16) * np.pi / 64)


def _synth_raw(subband_slots: np.ndarray, D: np.ndarray) -> np.ndarray:
    n_slots = subband_slots.shape[0]
    V = subband_slots @ _SYN_MAT.T  # (n_slots, 64)
    fifo = np.zeros((16, 64))
    out = np.empty(n_slots * 32)
    for t in range(n_slots):
        fifo = np.roll(fifo, 1, axis=0)
        fifo[0] = V[t]
        # U from alternating halves of the fifo (spec indexing)
        U = np.empty(512)
        for i in range(8):
            U[i * 64 : i * 64 + 32] = fifo[i * 2][:32]
            U[i * 64 + 32 : i * 64 + 64] = fifo[i * 2 + 1][32:]
        W = U * D
        out[t * 32 : (t + 1) * 32] = W.reshape(16, 32).sum(axis=0)
    return out


def analysis_filterbank(x: np.ndarray) -> np.ndarray:
    """Dual analysis (the encoder twin): PCM -> (n_slots, 32)."""
    n_slots = len(x) // 32
    x = np.asarray(x, dtype=np.float64)[: n_slots * 32]
    C = _PROTO * _FOLD_SIGN
    buf = np.zeros(512)
    out = np.empty((n_slots, 32))
    for t in range(n_slots):
        buf = np.roll(buf, 32)
        buf[:32] = x[t * 32 : (t + 1) * 32][::-1]
        Z = buf * C
        Y = Z.reshape(8, 64).sum(axis=0)
        out[t] = _ANA_MAT @ Y
    return out


def _calibrate_gain() -> float:
    """Deterministic unity-round-trip normalization: the absolute level
    reference a conforming decoder gets from the spec's D table is
    instead anchored to analysis∘synthesis == identity (module
    docstring boundary)."""
    x = np.cos(2 * np.pi * 0.013 * np.arange(32 * 96)) + 0.5
    y = _synth_raw(analysis_filterbank(x), _PROTO * 32.0 * _FOLD_SIGN)
    d = 481  # (512 - 32) + ana/syn slot offset, fixed by the structure
    n = len(x) - d - 32
    a, b = x[:n], y[d : d + n]
    return float(np.dot(a, b) / np.dot(b, b))


_SYN_GAIN = _calibrate_gain()


def synth_filterbank(subband_slots: np.ndarray) -> np.ndarray:
    """Spec-structured synthesis: (n_slots, 32) subband samples ->
    (n_slots*32,) PCM. Windowed-FIFO form of ISO 11172-3 Annex A with
    the in-repo prototype (see module docstring)."""
    return _synth_raw(subband_slots, _PROTO * 32.0 * _FOLD_SIGN * _SYN_GAIN)


# hybrid IMDCT overlap (576) + polyphase FIFO (512 - 32 + 1) latency
DECODER_DELAY = 576 + 481


# --- full decode -----------------------------------------------------------------------


def decode_mp3(payload: bytes):
    """Layer III sample decode on the decode_wav contract:
    (sample_rate, n_channels, mono float64 samples). See the module
    docstring for the validated-table and synthesis-window boundaries."""
    frames = list(iter_frames(payload))
    if not frames:
        raise ValueError("no Layer III frames found")
    hdr0 = frames[0][0]
    rate, nch = hdr0["rate"], hdr0["nch"]
    reservoir = b""
    overlap = [np.zeros((32, 18)) for _ in range(nch)]
    prev_sf: list[list[int] | None] = [None] * nch
    slots_per_gr = 18
    pcm_slots: list[np.ndarray] = []
    for hdr, si, main in frames:
        if hdr["rate"] != rate or hdr["nch"] != nch:
            raise ValueError("mid-stream format change")
        if hdr["mode"] == MODE_JOINT and (hdr["mode_ext"] & 1):
            raise NotImplementedError("intensity stereo is a documented boundary")
        mdb = si["main_data_begin"]
        if mdb > len(reservoir):
            # spec-legal stream entry mid-reservoir: skip this frame's
            # audio, keep accumulating main data
            reservoir = (reservoir + main)[-511:]
            continue
        data = (reservoir[len(reservoir) - mdb :] if mdb else b"") + main
        bits = _Bits(data)
        reservoir = (reservoir + main)[-511:]
        for gr_idx, gr in enumerate(si["granules"]):
            ch_samples = []
            for ch in range(nch):
                g = gr[ch]
                start = bits.pos
                limit = start + g["part2_3_length"]
                if limit > bits.nbits:
                    raise ValueError("part2_3 overruns available main data")
                if hdr["mpeg1"]:
                    scfsi = si["scfsi"][ch] if gr_idx == 1 else [0, 0, 0, 0]
                    sf_l, sf_s = _read_scalefactors_mpeg1(bits, g, scfsi, prev_sf[ch])
                    preflag = g["preflag"]
                    if g["block_type"] != 2:
                        prev_sf[ch] = sf_l
                else:
                    sf_l, sf_s, preflag = _read_scalefactors_lsf(bits, g)
                is_q = _decode_spectrum(bits, hdr, g, limit)
                bits.pos = limit  # ancillary/stuffing inside part2_3 tail
                xr = _requantize(hdr, g, sf_l, sf_s, preflag, is_q)
                xr = _reorder_short(hdr, g, xr)
                ch_samples.append((g, xr))
            # MS stereo (mode_ext bit 1)
            if nch == 2 and hdr["mode"] == MODE_JOINT and (hdr["mode_ext"] & 2):
                m, s = ch_samples[0][1], ch_samples[1][1]
                l = (m + s) / math.sqrt(2.0)
                r = (m - s) / math.sqrt(2.0)
                ch_samples = [(ch_samples[0][0], l), (ch_samples[1][0], r)]
            gr_pcm = []
            for ch in range(nch):
                g, xr = ch_samples[ch]
                xr = _antialias(g, xr)
                sb = _hybrid_synthesis(g, xr, overlap[ch])
                # frequency inversion: odd time samples of odd subbands
                sb[1::2, 1::2] *= -1.0
                gr_pcm.append(sb.T)  # (18 slots, 32 subbands)
            mono = gr_pcm[0] if nch == 1 else (gr_pcm[0] + gr_pcm[1]) / 2.0
            pcm_slots.append(mono)
    if not pcm_slots:
        raise ValueError("no decodable granules")
    slots = np.vstack(pcm_slots)  # (n_slots_total, 32)
    samples = synth_filterbank(slots)
    # trim the deterministic decode-side algorithmic delay (hybrid
    # overlap-add 576 + polyphase 481) so a same-rate master aligns
    # frame-exact with the decode — the alignment the chunk-tier audio
    # fingerprint needs. Foreign encoders add their own analysis-side
    # delay (LAME: ~576+529, written to its Info tag) which is not
    # knowable here; the anchor fingerprint tier is the offset-invariant
    # answer for those.
    return rate, nch, samples[DECODER_DELAY:]


# --- minimal encoder twin ---------------------------------------------------------
#
# Mono MPEG-1 Layer III, long blocks, scalefactors all zero, no bit
# reservoir (main_data_begin = 0 every frame), big-value region only
# (count1 empty — the big-value region may legally carry ±1 values), and
# only VALIDATED Huffman tables. Two quantization modes via ``max_q``:
# the default (max_q=5) caps magnitudes at table 9's range via the
# global_gain choice — coarse but spec-shaped, peak locations exact,
# ~3-bit amplitude resolution; max_q > 5 quantizes finely and encodes
# each granule with the cheapest escape table (16-23) whose linbits
# field covers the granule's max magnitude — the same table family
# real encoders select at standard bitrates for non-quiet content,
# which is what makes the encode∘decode witness for the escape decode
# path a realistic one.


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def to_bytes(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        return bytes(
            sum(bits[i + j] << (7 - j) for j in range(8)) for i in range(0, len(bits), 8)
        )


_ENC_TABLE_ID = 9
_ENC_CODES = {
    (x, y): (HUFFMAN_TABLES[_ENC_TABLE_ID][3][x][y], HUFFMAN_TABLES[_ENC_TABLE_ID][4][x][y])
    for x in range(6)
    for y in range(6)
}
_ENC_MAX = 5


def _enc_pick_table(max_mag: int) -> int:
    """Smallest-range table covering ``max_mag``: table 9 for <= 5,
    else the 16-family escape table with the fewest linbits whose
    escape range (15 + 2^linbits - 1) covers it."""
    if max_mag <= _ENC_MAX:
        return _ENC_TABLE_ID
    for tid in (16, 17, 18, 19, 20, 21, 22, 23):
        if max_mag <= 15 + (1 << LINBITS[tid]) - 1:
            return tid
    raise ValueError(f"quantized magnitude {max_mag} exceeds table 23's escape range")


def _enc_write_pair(w: "_BitWriter", tid: int, a: int, b: int) -> None:
    """Emit one big-value pair in the decoder's exact read order:
    codeword, x linbits (escape symbol only), x sign, y linbits, y sign."""
    t = HUFFMAN_TABLES[tid]
    lin = t[2]
    xs, ys = min(abs(a), 15) if lin else abs(a), min(abs(b), 15) if lin else abs(b)
    w.write(t[4][xs][ys], t[3][xs][ys])
    if lin and xs == 15:
        w.write(abs(a) - 15, lin)
    if a:
        w.write(1 if a < 0 else 0, 1)
    if lin and ys == 15:
        w.write(abs(b) - 15, lin)
    if b:
        w.write(1 if b < 0 else 0, 1)

_MDCT36_FWD = _IMDCT36.T * (4.0 / 36.0)


def _granule_spectrum(sb_prev: np.ndarray, sb_cur: np.ndarray) -> np.ndarray:
    """(32, 18)+(32, 18) subband slots -> 576 MDCT coefficients (the
    decoder hybrid's exact inverse: sine window, TDAC overlap)."""
    w = _WIN_LONG[0]
    xr = np.empty(576)
    for sb in range(32):
        z = np.concatenate([sb_prev[sb], sb_cur[sb]]) * w
        xr[sb * 18 : (sb + 1) * 18] = _MDCT36_FWD @ z
    return xr


def _antialias_inverse(xr: np.ndarray) -> np.ndarray:
    """Inverse of the decoder's alias-reduction butterflies."""
    out = xr.copy()
    for sb in range(1, 32):
        for i in range(8):
            lo = sb * 18 - 1 - i
            hi = sb * 18 + i
            a, b = out[lo], out[hi]
            out[lo] = a * _AA_CS[i] + b * _AA_CA[i]
            out[hi] = b * _AA_CS[i] - a * _AA_CA[i]
    return out


def encode_mp3(x: np.ndarray, rate: int, max_q: int = _ENC_MAX) -> bytes:
    """Encode mono float samples ([-1, 1]) to a Layer III stream (see
    the encoder-twin notes above). MPEG-1 rates (32/44.1/48 kHz) pack
    two granules per frame; MPEG-2 (16/22.05/24 kHz) and MPEG-2.5
    (8/11.025/12 kHz) rates use the LSF single-granule layout.
    ``max_q`` caps the quantized magnitude: the default 5 keeps the
    historical coarse table-9 twin byte-identical; larger values select
    escape tables (16-23) per granule as real encoders do."""
    version = next((v for v, rs in SAMPLE_RATES.items() if rate in rs), None)
    if version is None:
        raise ValueError(f"not a Layer III sample rate: {rate}")
    mpeg1 = version == 3
    sri = SAMPLE_RATES[version].index(rate)
    ngr = 2 if mpeg1 else 1
    frame_samples = 576 * ngr
    x = np.asarray(x, dtype=np.float64)
    n_frames = len(x) // frame_samples
    if n_frames == 0:
        raise ValueError(f"need at least {frame_samples} samples")
    slots = analysis_filterbank(x[: n_frames * frame_samples])
    # frequency inversion (dual of the decoder's)
    sb_all = slots.T.copy()  # (32, n_slots)
    sb_all[1::2, 1::2] *= -1.0
    frames = []
    prev = np.zeros((32, 18))
    for fi in range(n_frames):
        granule_bits = []
        for gr in range(ngr):
            s0 = (fi * ngr + gr) * 18
            cur = sb_all[:, s0 : s0 + 18]
            xr = _granule_spectrum(prev, cur)
            prev = cur
            xr = _antialias_inverse(xr)
            # global_gain: smallest A with round((max/2^A)^(3/4)) <= max_q
            mx = float(np.abs(xr).max())
            if mx == 0.0:
                gg, is_q = 210, np.zeros(576, dtype=np.int64)
            else:
                a_min = math.log2(mx / (max_q + 0.4) ** (4.0 / 3.0))
                gg = min(255, max(0, 210 + math.ceil(4 * a_min)))
                q = (np.abs(xr) / 2.0 ** ((gg - 210) / 4.0)) ** 0.75
                is_q = (np.sign(xr) * np.round(q)).astype(np.int64)
                is_q = np.clip(is_q, -max_q, max_q)
            nz = np.nonzero(is_q)[0]
            last = int(nz[-1]) + 1 if len(nz) else 0
            big_values = (last + 1) // 2
            tid = _enc_pick_table(int(np.abs(is_q).max()) if last else 0)
            w = _BitWriter()
            for p in range(big_values):
                _enc_write_pair(w, tid, int(is_q[2 * p]), int(is_q[2 * p + 1]))
            granule_bits.append(
                {"gg": gg, "big_values": big_values, "bits": w.bits, "tid": tid}
            )
        # side info (mono: MPEG-1 17 bytes / LSF 9 bytes)
        si = _BitWriter()
        if mpeg1:
            si.write(0, 9)  # main_data_begin
            si.write(0, 5)  # private
            si.write(0, 4)  # scfsi
        else:
            si.write(0, 8)
            si.write(0, 1)
        for g in granule_bits:
            si.write(len(g["bits"]), 12)  # part2_3 (scalefac bits = 0)
            si.write(g["big_values"], 9)
            si.write(g["gg"], 8)
            # scalefac_compress 0: MPEG-1 slen (0,0); LSF slen (0,0,0,0)
            si.write(0, 4 if mpeg1 else 9)
            si.write(0, 1)  # window_switching_flag
            for _ in range(3):
                si.write(g["tid"], 5)
            si.write(15, 4)  # region0_count
            si.write(5, 3)  # region1_count (15+5+2 == 22 bands: legal)
            if mpeg1:
                si.write(0, 1)  # preflag
            si.write(0, 1)  # scalefac_scale
            si.write(0, 1)  # count1table_select
        side = si.to_bytes()
        assert len(side) == (17 if mpeg1 else 9), len(side)
        main = _BitWriter()
        for g in granule_bits:
            for b in g["bits"]:
                main.bits.append(b)
        body = side + main.to_bytes()
        # smallest standard bitrate whose frame holds the payload
        brtab = BITRATES_V1_L3 if mpeg1 else BITRATES_V2_L3
        per_kbit = 144000 if mpeg1 else 72000
        for bri in range(1, 15):
            flen = per_kbit * brtab[bri] // rate
            if flen >= 4 + len(body):
                break
        else:
            raise ValueError("granule too dense for the top bitrate (raise quantization)")
        ver_bits = 3 if mpeg1 else (2 if version == 2 else 0)
        hdr = bytes(
            [
                0xFF,
                0xE0 | (ver_bits << 3) | (1 << 1) | 1,  # Layer III, no CRC
                (bri << 4) | (sri << 2),
                (MODE_MONO << 6),
            ]
        )
        frames.append(hdr + body + b"\x00" * (flen - 4 - len(body)))
    return b"".join(frames)


__all__ = [
    "decode_mp3",
    "encode_mp3",
    "iter_frames",
    "parse_header",
    "HUFFMAN_TABLES",
    "COUNT1_A",
    "COUNT1_B",
    "SUPPORTED_TABLES",
    "SFB_LONG",
    "SFB_SHORT",
    "analysis_filterbank",
    "synth_filterbank",
]
