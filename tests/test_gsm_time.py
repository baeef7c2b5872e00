import numpy as np
import pytest

from openbts_ttsou_tpu.utils import HYPERFRAME, Time, fn_compare, fn_delta
from openbts_ttsou_tpu.utils.gsm_time import (
    SLOT_SAMPLE_PATTERN,
    slot_sample_offset,
)


def test_hyperframe_value():
    assert HYPERFRAME == 2048 * 26 * 51 == 2715648


def test_fn_delta_wraparound():
    assert fn_delta(5, 3) == 2
    assert fn_delta(3, 5) == -2
    assert fn_delta(0, HYPERFRAME - 1) == 1
    assert fn_delta(HYPERFRAME - 1, 0) == -1
    assert fn_delta(7, 7) == 0


def test_fn_compare():
    assert fn_compare(5, 3) == 1
    assert fn_compare(3, 5) == -1
    assert fn_compare(0, HYPERFRAME - 1) == 1  # 0 is "after" the wrap


def test_fn_delta_jnp():
    import jax.numpy as jnp

    v1 = jnp.array([5, 3, 0, HYPERFRAME - 1])
    v2 = jnp.array([3, 5, HYPERFRAME - 1, 0])
    np.testing.assert_array_equal(np.asarray(fn_delta(v1, v2)), [2, -2, 1, -1])


def test_time_arithmetic():
    t = Time(HYPERFRAME - 1, 7)
    t2 = t.inc_tn()
    assert t2.fn == 0 and t2.tn == 0
    t3 = t2.dec_tn()
    assert t3.fn == HYPERFRAME - 1 and t3.tn == 7
    assert (Time(10, 0) - Time(4, 0)) == 6
    assert Time(10, 3) + 5 == Time(15, 3)
    assert Time(10, 3) - 11 == Time(HYPERFRAME - 1, 3)


def test_time_add_time_carries_tn():
    # (reference: GSM::Time::operator+(Time), GSMCommon.h:404-409)
    a, b = Time(1, 5), Time(2, 6)
    c = a + b
    assert c.tn == (5 + 6) % 8
    assert c.fn == 1 + 2 + (5 + 6) // 8


def test_time_comparison_modular():
    assert Time(0, 0) > Time(HYPERFRAME - 1, 7)
    assert Time(5, 3) < Time(5, 4)
    assert Time(5, 3) <= Time(5, 3)


def test_roll_forward():
    t = Time(100, 0)
    t2 = t.roll_forward(51 % 26, 26)
    assert t2.fn % 26 == 51 % 26
    assert t2.fn >= 100
    # already at position → unchanged
    assert t2.roll_forward(t2.fn % 26, 26) == t2


def test_slot_pattern():
    assert sum(SLOT_SAMPLE_PATTERN) == 1250
    assert slot_sample_offset(0) == 0
    assert slot_sample_offset(1) == 157
    assert slot_sample_offset(4) == 157 + 156 * 3


def test_constants_shapes():
    from openbts_ttsou_tpu.utils import constants as C

    assert C.TRAINING_SEQUENCE.shape == (8, 26)
    assert C.RACH_SYNCH_SEQUENCE.shape == (41,)
    assert C.DUMMY_BURST.shape == (148,)
    assert set(np.unique(C.TRAINING_SEQUENCE)) <= {0, 1}
