"""Validate the derived alphabet tables against the reference's semantics
(literal values from mg-aligner/io.h:28-149, used here as test vectors only)."""

import numpy as np

from bwbble_tpu import constants as C


def test_gray_tables():
    assert bytes(C.IUPAC_CHAR) == b"$TKGSBYCMHNVRDWA"
    assert list(C.GRAY_VAL) == [0, 1, 3, 2, 6, 7, 5, 4, 12, 13, 15, 14, 10, 11, 9, 8]
    assert list(C.IUPAC_COMPL) == [0, 15, 8, 7, 4, 11, 12, 3, 2, 13, 10, 5, 6, 9, 14, 1]
    assert list(C.IS_SNP) == [0, 0, 1, 0, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1, 0]


def test_nucl_bases():
    assert C.NUCL_BASES.tolist() == [
        [8, 9, 11, 12, 13, 14, 15],
        [2, 3, 4, 5, 11, 12, 13],
        [4, 5, 6, 7, 8, 9, 11],
        [1, 2, 5, 6, 9, 13, 14],
    ]
    assert list(C.NT4_GRAY) == [15, 3, 7, 1, 10]
    assert list(C.NT4_GRAY_VAL) == [8, 2, 4, 1, 15]
    assert list(C.NT4_COMPLEMENT) == [3, 2, 1, 0, 4]


def test_ascii_tables():
    for ch, v in [("$", 0), ("A", 15), ("B", 5), ("C", 7), ("D", 13),
                  ("G", 3), ("H", 9), ("K", 2), ("M", 8), ("N", 10),
                  ("R", 12), ("S", 4), ("T", 1), ("V", 11), ("W", 14),
                  ("Y", 6), ("a", 15), ("x", 10)]:
        assert C.NT16_TABLE[ord(ch)] == v
    for ch, v in [("A", 0), ("C", 2), ("G", 1), ("T", 3), ("N", 4), ("Z", 4)]:
        assert C.NT4_TABLE[ord(ch)] == v


def test_match_matrix_agrees_with_nucl_bases():
    for b in range(4):
        members = {j for j in range(16) if C.MATCH_MATRIX[b, j]}
        # nucl_bases rows are exactly the members minus N
        assert set(C.NUCL_BASES[b].tolist()) == members - {C.ORDER_N}


def test_skipped_orders():
    assert C.SKIPPED_ORDERS == (5, 9, 11, 13)
    # they are exactly the three-base IUPAC codes
    for j in C.SKIPPED_ORDERS:
        assert bin(int(C.GRAY_VAL[j])).count("1") == 3
