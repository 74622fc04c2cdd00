"""Regression guard for the driver_sim cell comparator.

The r11 gate escape: `driver_sim._cells_equal` compared floats with
`==`, under which `-0.0 == 0.0` — but the external driver value-hashes
cell reprs, which DO distinguish signed zeros, so the builder's "full
sweep MATCH" preceded a driver red row (`agg_mutual_information`).
These tests pin the hardened semantics so the comparator can never
regress to being blinder than the driver.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

spec = importlib.util.spec_from_file_location(
    "driver_sim", os.path.join(REPO, "scripts", "driver_sim.py")
)
ds = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ds)


def test_signed_zero_is_a_mismatch():
    assert not ds._cells_equal(-0.0, 0.0)
    assert not ds._cells_equal(0.0, -0.0)


def test_same_sign_zero_matches():
    assert ds._cells_equal(0.0, 0.0)
    assert ds._cells_equal(-0.0, -0.0)


def test_plain_floats_unaffected():
    assert ds._cells_equal(1.25, 1.25)
    assert not ds._cells_equal(1.25, 1.250001)
    assert not ds._cells_equal(-0.0001, 0.0)


def test_int_zero_vs_float_zero_still_type_strict():
    # int 0 vs float 0.0 was already a mismatch (dtype strictness);
    # the signed-zero branch must not loosen it
    assert not ds._cells_equal(0, 0.0)
    assert ds._cells_equal(0, 0)
    assert ds._cells_equal(0, -0)  # -0 is int 0; no signed zero for ints


def test_bool_vs_int_unaffected():
    assert not ds._cells_equal(True, 1)
    assert ds._cells_equal(True, True)
