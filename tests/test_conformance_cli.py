"""Backend conformance runner (r3 verdict #6): the operator-facing
``cli check-backend`` must validate bring-your-own-weights backends —
stubs AND real-model-sized heavy fakes — without the user reading test
code, and must FAIL loudly on a contract violation."""

import json
import os
import subprocess
import sys

import pytest

from finance_sc_relations_ray.stages.backends import (
    CONTRACT_SAMPLES,
    HeavyFakeScorer,
    HeavyFakeTagger,
    run_conformance,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_stub_tagger_conforms_with_pool_smoke(ray_session):
    from finance_sc_relations_ray.stages.ner import GazetteerTagger

    out = run_conformance(GazetteerTagger, "tagger")
    assert out["contract"] == "ok"
    assert out["pool_smoke"] == "ok"
    # init-once per actor, proven structurally by the ledger
    assert 0 < out["n_actor_inits"] <= out["concurrency"]


def test_stub_scorer_conforms_with_pool_smoke(ray_session):
    from finance_sc_relations_ray.stages.scoring import RuleReScorer

    out = run_conformance(RuleReScorer, "scorer")
    assert out["contract"] == "ok" and out["pool_smoke"] == "ok"


def test_heavy_fakes_conform(ray_session):
    import functools

    out = run_conformance(
        functools.partial(HeavyFakeTagger, state_mb=8, init_delay_s=0.05),
        "tagger",
    )
    assert out["pool_smoke"] == "ok"
    out = run_conformance(
        functools.partial(HeavyFakeScorer, state_mb=8, init_delay_s=0.05),
        "scorer",
        pool_smoke=False,
    )
    assert out["contract"] == "ok"


def test_tokenizer_and_encoder_conform():
    from finance_sc_relations_ray.functions.names import encode_names
    from finance_sc_relations_ray.functions.tokenizer import StubTokenizer

    assert run_conformance(StubTokenizer, "tokenizer")["contract"] == "ok"
    assert run_conformance(encode_names, "encoder")["contract"] == "ok"


def test_broken_tagger_fails_contract():
    """Overlapping spans violate the ordering clause the tagging stage
    relies on — the runner must raise, not pass."""

    class OverlappingTagger:
        def spans(self, sent):
            if len(sent) < 8:
                return []
            return [
                {"text": sent[0:6], "label": "ORG", "start": 0, "end": 6},
                {"text": sent[4:8], "label": "ORG", "start": 4, "end": 8},
            ]

    with pytest.raises(AssertionError, match="overlap"):
        run_conformance(OverlappingTagger, "tagger", pool_smoke=False)


def test_unknown_kind_raises():
    with pytest.raises(ValueError, match="unknown backend kind"):
        run_conformance(lambda: None, "llm")


def test_cli_check_backend_reports_failure(tmp_path):
    """End-to-end CLI: a backend whose spans lie about offsets exits 1
    with the failing clause in the JSON summary."""
    (tmp_path / "broken_backend.py").write_text(
        "class LyingTagger:\n"
        "    def spans(self, sent):\n"
        "        if not sent:\n"
        "            return []\n"
        "        return [{'text': 'XYZ', 'label': 'ORG',"
        " 'start': 0, 'end': 3}]\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{tmp_path}{os.pathsep}{REPO}"
    proc = subprocess.run(
        [
            sys.executable, "-m", "finance_sc_relations_ray.cli",
            "check-backend", "broken_backend:LyingTagger",
            "--kind", "tagger", "--no-pool-smoke",
        ],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert proc.returncode == 1, proc.stderr
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["contract"] == "FAILED"


def test_contract_samples_cover_all_kinds():
    assert set(CONTRACT_SAMPLES) == {"tagger", "scorer", "tokenizer", "encoder"}
    assert all(len(v) >= 3 for v in CONTRACT_SAMPLES.values())


def test_pipeline_smoke_cli_heavy_fakes():
    """r4 verdict #7: the --pipeline smoke runs the 200-page e2e with
    user backend classes loading inside the actors (the module:Class
    registry seam) and prints triple P/R vs the stub oracle — 1.0/1.0
    for the delegating heavy fakes."""
    out = subprocess.run(
        [
            sys.executable, "-m", "finance_sc_relations_ray.cli",
            "check-backend", "--pipeline",
            "--tagger",
            "finance_sc_relations_ray.stages.backends:HeavyFakeTagger",
            "--scorer",
            "finance_sc_relations_ray.stages.backends:HeavyFakeScorer",
            "--num-cpus", "4", "--n-pages", "120",
        ],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["tagger_contract"] == "ok"
    assert summary["scorer_contract"] == "ok"
    assert summary["precision"] == 1.0 and summary["recall"] == 1.0
    assert summary["n_triples"] == summary["n_oracle_triples"] > 0


def test_pipeline_smoke_cli_rejects_lying_backend():
    """A backend that violates the span contract fails the smoke with
    exit 1 and a JSON error BEFORE any pipeline time is spent."""
    out = subprocess.run(
        [
            sys.executable, "-m", "finance_sc_relations_ray.cli",
            "check-backend", "--pipeline",
            "--tagger", "tests.test_conformance_cli:LyingSpanTagger",
            "--scorer",
            "finance_sc_relations_ray.stages.backends:HeavyFakeScorer",
            "--num-cpus", "4",
        ],
        capture_output=True, text=True, cwd=REPO, timeout=300,
    )
    assert out.returncode == 1
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert "error" in summary and "tagger_contract" not in summary


class LyingSpanTagger:
    """Span offsets that do not slice to the span text — must fail."""

    def spans(self, sent: str) -> list[dict]:
        return [{"text": "Nope Corp", "label": "ORG", "start": 0, "end": 3}]
