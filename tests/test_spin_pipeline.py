"""General-spin-system pipeline: TFIM through all four stages."""

import numpy as np
import pytest

from flow_guided_krylov_tpu.hamiltonians import TransverseFieldIsing
from flow_guided_krylov_tpu.pipeline import (FlowGuidedKrylovPipeline,
                                             PipelineConfig)


def test_tfim_pipeline_end_to_end():
    tfim = TransverseFieldIsing(6, V=1.0, h=0.6)
    e_exact = float(np.linalg.eigh(tfim.exact_dense())[0][0])
    cfg = PipelineConfig(max_epochs=80, min_epochs=30, samples_per_batch=256,
                         nqs_hidden_dims=[64, 64], nf_hidden_dims=[64, 64],
                         max_krylov_dim=4, shots_per_krylov=5000,
                         verbose=False)
    pipe = FlowGuidedKrylovPipeline(tfim, cfg, exact_energy=e_exact)
    assert not pipe.is_molecular
    out = pipe.run()
    assert out["chemical_accuracy"], out["error_mha"]
    assert out["final_energy"] >= e_exact - 1e-9  # variational
    assert pipe.results["stage1"]["mode"] == "spin"
