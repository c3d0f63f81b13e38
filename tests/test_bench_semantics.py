"""Every committed benchmark artifact must carry its measurement-semantics
label (VERDICT r4 #9): on this harness, frame timings are journal-DISPATCH
acks (no execution fence exists through the axon tunnel — docs/PERF_NOTES.md
r4), and a number like `fwdbwd_amortized_rays_per_s_1080p: 9.0e9` is only
honest with that label attached.  This test fails if a future edit drops
the label, so the prose convention is mechanically enforced."""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# artifact -> required substring of its semantics label.  TPU-tunnel
# artifacts must say "dispatch" (their timings are acks); the CPU scaling
# canary's timings are real blocking times and must say so.
LABELED_ARTIFACTS = {
    "bench_frame_modes.json": "dispatch",
    "bench_diff_baseline.json": "dispatch",
    "roofline_march.json": "dispatch",
    "bench_scaling_cpu.json": "",
}
SEMANTICS_KEYS = ("metric_semantics", "semantics")


@pytest.mark.parametrize("name,needle", sorted(LABELED_ARTIFACTS.items()))
def test_artifact_carries_semantics_label(name, needle):
    path = os.path.join(REPO, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} not generated yet")
    with open(path) as f:
        doc = json.load(f)
    scopes = [doc]
    if isinstance(doc, dict) and isinstance(doc.get("_meta"), dict):
        scopes.append(doc["_meta"])
    labels = [
        scope[k]
        for scope in scopes
        if isinstance(scope, dict)
        for k in SEMANTICS_KEYS
        if isinstance(scope.get(k), str)
    ]
    assert labels, (
        f"{name} has no {SEMANTICS_KEYS} label; every committed bench "
        "artifact must state what its timings mean"
    )
    if needle:
        assert any(needle in s.lower() for s in labels), (
            f"{name}'s semantics label no longer mentions {needle!r}: "
            f"{labels}"
        )


def test_fit_artifact_records_backend():
    """bench_fit_result.json must say what platform/device produced it
    (VERDICT r4 weak #3): the headline steps/s is meaningless without the
    backend."""
    path = os.path.join(REPO, "bench_fit_result.json")
    if not os.path.exists(path):
        pytest.skip("bench_fit_result.json not generated yet")
    with open(path) as f:
        doc = json.load(f)
    assert "platform" in doc and "device" in doc and "jax_version" in doc, (
        "fit artifact must record platform/device/jax_version"
    )
