"""The structured (restricted) pair Hessian must equal the dense AD Hessian."""

import jax
import jax.numpy as jnp
import numpy as np

import quantumcollocation_tpu as qct
from quantumcollocation_tpu.solver.stage_nlp import make_nlp_functions


def test_structured_hessian_matches_dense():
    sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    prob = qct.UnitarySmoothPulseProblem(
        sys, qct.GATES["H"], 9, 0.2,
        ipopt_options=qct.SolverOptions(print_level=1),
        piccolo_options=qct.PiccoloOptions(verbose=False),
        rng=np.random.default_rng(0),
    )
    nlp = prob.nlp
    assert nlp.nl_coords is not None and len(nlp.nl_coords) < nlp.d

    funcs_structured = make_nlp_functions(nlp, exact_hessian=True)
    import dataclasses

    nlp_dense = dataclasses.replace(nlp, nl_coords=None)
    funcs_dense = make_nlp_functions(nlp_dense, exact_hessian=True)

    rng = np.random.default_rng(1)
    Z = jnp.asarray(nlp.z0 + 0.01 * rng.standard_normal(nlp.z0.shape))
    lam = jnp.asarray(rng.standard_normal((nlp.T - 1, nlp.s)))
    w = jnp.zeros((nlp.T, nlp.m))

    H_s, C_s = funcs_structured.hess_blocks(Z, lam, w)
    H_d, C_d = funcs_dense.hess_blocks(Z, lam, w)
    np.testing.assert_allclose(np.asarray(H_s), np.asarray(H_d), atol=1e-9)
    np.testing.assert_allclose(np.asarray(C_s), np.asarray(C_d), atol=1e-9)


def test_robustness_problem_keeps_exactness():
    sys = qct.QuantumSystem(qct.GATES["Z"], [qct.GATES["X"], qct.GATES["Y"]])
    base = qct.UnitarySmoothPulseProblem(
        sys, qct.GATES["H"], 7, 0.2,
        ipopt_options=qct.SolverOptions(print_level=1),
        piccolo_options=qct.PiccoloOptions(verbose=False),
        rng=np.random.default_rng(0),
    )
    rob = qct.UnitaryRobustnessProblem(
        qct.PAULIS["Z"], base, sys, final_fidelity=0.5
    )
    nlp = rob.nlp
    # robustness accumulator makes the unitary state nonlinear too
    assert nlp.nl_coords is not None

    funcs_structured = make_nlp_functions(nlp, exact_hessian=True)
    import dataclasses

    funcs_dense = make_nlp_functions(
        dataclasses.replace(nlp, nl_coords=None), exact_hessian=True
    )
    rng = np.random.default_rng(2)
    Z = jnp.asarray(nlp.z0 + 0.01 * rng.standard_normal(nlp.z0.shape))
    lam = jnp.asarray(rng.standard_normal((nlp.T - 1, nlp.s)))
    w = jnp.zeros((nlp.T, nlp.m))
    H_s, C_s = funcs_structured.hess_blocks(Z, lam, w)
    H_d, C_d = funcs_dense.hess_blocks(Z, lam, w)
    np.testing.assert_allclose(np.asarray(H_s), np.asarray(H_d), atol=1e-9)
    np.testing.assert_allclose(np.asarray(C_s), np.asarray(C_d), atol=1e-9)
