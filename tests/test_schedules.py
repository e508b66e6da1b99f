"""Schedule/ramp-up tests (reference: utils/utils.py:7-65, aux_path_memory.py:118-120)."""
import math

import numpy as np
import pytest

from pacingpseudo_tpu.train import (
    cosine_lr_decay,
    gaussian_ramp_up,
    linear_lr_decay,
    make_lr_schedule,
    memory_momentum,
    poly_lr_decay,
)


def test_poly():
    assert np.allclose(poly_lr_decay(0, 400, 1e-4), 1e-4)
    assert np.allclose(poly_lr_decay(100, 400, 1e-4), 1e-4 * (1 - 100 / 400) ** 0.9)


def test_cosine():
    assert np.allclose(cosine_lr_decay(0, 400, 1e-4), 1e-4)
    assert np.allclose(cosine_lr_decay(200, 400, 1e-4), 0.5e-4, atol=1e-10)


def test_linear():
    assert np.allclose(linear_lr_decay(100, 400, 1e-4), 0.75e-4)


def test_make_lr_schedule():
    fn = make_lr_schedule("poly", 400, 1e-4)
    assert np.allclose(fn(10), poly_lr_decay(10, 400, 1e-4))
    with pytest.raises(ValueError):
        make_lr_schedule("bogus", 400, 1e-4)


def test_gaussian_ramp_up_matches_reference_formula():
    # reference utils/utils.py:53-65: max_t hard-coded 80
    for t in [0, 10, 79]:
        expect = 1.0 * math.exp(-8.0 * (1 - t / 80))
        assert np.allclose(gaussian_ramp_up(t, 1.0, scale=8.0), expect, rtol=1e-6)
    # plateau at and beyond max_t
    assert np.allclose(gaussian_ramp_up(80, 1.0, scale=8.0), 1.0)
    assert np.allclose(gaussian_ramp_up(399, 1.0, scale=8.0), 1.0)


def test_memory_momentum_ramps_down():
    m0 = memory_momentum(0, 400)
    m_mid = memory_momentum(200, 400)
    m_end = memory_momentum(400, 400)
    assert np.allclose(m0, 0.9)
    assert m0 > m_mid > m_end
    assert np.allclose(m_end, 0.0)
    assert np.allclose(m_mid, (1 - 0.5) ** 0.9 * 0.9)
