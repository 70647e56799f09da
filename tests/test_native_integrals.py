"""Native C++ ERI engine vs pure-Python reference implementation."""

import numpy as np
import pytest

from flow_guided_krylov_tpu.chem.basis import build_shells
from flow_guided_krylov_tpu.chem.integrals import (_eri_contracted,
                                                   expand_shells)
from flow_guided_krylov_tpu.chem.native import (eri_tensor_native,
                                                native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native engine unavailable")


def test_native_matches_python_h2o():
    ang = np.radians(104.5)
    geom = [("O", (0, 0, 0)), ("H", (0.96, 0, 0)),
            ("H", (0.96 * np.cos(ang), 0.96 * np.sin(ang), 0))]
    funcs = expand_shells(build_shells(geom))
    eri = eri_tensor_native(funcs)
    assert eri is not None
    rng = np.random.default_rng(1)
    for _ in range(25):
        i, j, k, l = rng.integers(0, len(funcs), 4)
        v_py = _eri_contracted(funcs[i], funcs[j], funcs[k], funcs[l])
        assert eri[i, j, k, l] == pytest.approx(v_py, abs=1e-12)
    # 8-fold symmetry
    assert np.allclose(eri, eri.transpose(1, 0, 2, 3))
    assert np.allclose(eri, eri.transpose(2, 3, 0, 1))


def test_native_631g():
    funcs = expand_shells(build_shells(
        [("H", (0, 0, 0)), ("H", (0, 0, 0.74))], basis="6-31g"))
    eri = eri_tensor_native(funcs)
    rng = np.random.default_rng(2)
    for _ in range(10):
        i, j, k, l = rng.integers(0, len(funcs), 4)
        v_py = _eri_contracted(funcs[i], funcs[j], funcs[k], funcs[l])
        assert eri[i, j, k, l] == pytest.approx(v_py, abs=1e-12)
