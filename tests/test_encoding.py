"""Encoding normalization kernels (rules.repair_mojibake / nfc_normalize):
semantic invariants beyond the oracle-equality harness."""

import unicodedata as ud

import pyarrow as pa

from scripts_ray.rules import (
    MOJIBAKE_MAP,
    NFC_PLANT,
    repair_mojibake,
    nfc_normalize,
)


def test_mojibake_map_is_real_latin1_misdecode():
    # every entry IS the latin-1 misdecode of its target — the table can't
    # drift from the encoding phenomenon it claims to repair
    for bad, good in MOJIBAKE_MAP:
        assert bad == good.encode("utf-8").decode("latin-1")


def test_repair_round_trips_full_misdecode():
    orig = "Är det så kört? Över én å bro"
    moji = orig.encode("utf-8").decode("latin-1")
    assert moji != orig
    out = repair_mojibake(pa.array([moji, "clean ascii", ""])).to_pylist()
    assert out == [orig, "clean ascii", ""]


def test_nfc_composes_and_is_idempotent():
    decomposed = "x" + NFC_PLANT
    assert ud.normalize("NFC", decomposed) != decomposed  # plant is real
    once = nfc_normalize(pa.array([decomposed, "plain", "ärlig"])).to_pylist()
    assert once[0] == ud.normalize("NFC", decomposed)
    assert once[1] == "plain"
    twice = nfc_normalize(pa.array(once)).to_pylist()
    assert twice == once  # idempotent


def test_nfc_ascii_fast_path_returns_input_array():
    arr = pa.array(["only", "ascii", "rows"])
    assert nfc_normalize(arr) is arr  # zero-copy: no rows needed work
