"""The egress-day one-command chain (cli/reproduce.py): command wiring and
the Table-1 comparison gate, offline (subprocess mocked — the real sweep is
exercised by the benchmark tests and the dry-run)."""

import os
import subprocess

import pytest

from summarizer_tpu.cli import reproduce


def test_table1_transcription_complete():
    # 10 Table-1 families x 3 datasets + the Human upper bound on
    # tvsum/summe (no LOL cell: single annotator) — BASELINE.md Table 1.
    assert len(reproduce.TABLE1) == 32
    models = {m for m, _ in reproduce.TABLE1}
    assert "SumGAN-att" in models and "VASNet_loc" in models
    assert "Human (LOO)" in models
    assert ("Human (LOO)", "LOL") not in reproduce.TABLE1
    for (_, ds), (avg_f, max_f, corr) in reproduce.TABLE1.items():
        assert 0.0 <= avg_f <= max_f <= 1.0
        assert -1.0 <= corr <= 1.0
        if ds == "LOL":  # single annotator: one published F1
            assert avg_f == max_f


def test_dataset_of():
    assert reproduce._dataset_of("splits/summe_splits.json") == "summe"
    assert reproduce._dataset_of("splits/LOL_splits.json") == "LOL"
    assert reproduce._dataset_of("splits/tvsum_splits_aug.json") == "tvsum"


def test_compare_informational_on_repo_table(capsys):
    # The committed table must parse and diff without error; informational
    # mode (dry run / synthetic fixtures) never gates.
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    rc = reproduce.compare_vs_table1(f1_tol=0.05, informational=True)
    out = capsys.readouterr().out
    assert rc == 0
    assert "compared" in out and "Table-1 cells" in out


def test_chain_order_and_flags(monkeypatch, tmp_path, capsys):
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        return subprocess.CompletedProcess(cmd, 0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    compared = {}

    def fake_compare(f1_tol, informational, table="BENCHMARK_TABLE.txt"):
        compared["table"] = table
        return 0

    monkeypatch.setattr(reproduce, "compare_vs_table1", fake_compare)
    with pytest.raises(SystemExit) as e:
        reproduce.main(["--dry-run"])
    assert e.value.code == 0
    # download --synthetic, then benchmark (tiny budgets), then merge.
    def head(c):
        return c[2] if c[1] == "-m" else c[1].split("/")[-1]

    assert [head(c) for c in calls] == [
        "summarizer_tpu.cli.download",
        "summarizer_tpu.cli.benchmark",
        "merge_benchmark_tables.py",
    ]
    assert "--synthetic" in calls[0]
    assert "-e" in calls[1] and "--in-process" in calls[1]
    # Rehearsal rows merge into a scratch table and the comparison reads the
    # same scratch table — a dry run must never touch BENCHMARK_TABLE.txt.
    assert "--out" in calls[2]
    scratch = calls[2][calls[2].index("--out") + 1]
    assert scratch != "BENCHMARK_TABLE.txt"
    assert compared["table"] == scratch
    # All three datasets ride the sweep even in the dry run.
    s_arg = calls[1][calls[1].index("-s") + 1]
    assert all(ds in s_arg for ds in ("summe", "tvsum", "LOL"))


def test_real_mode_gates_on_failures(monkeypatch):
    monkeypatch.setattr(
        subprocess, "run",
        lambda cmd, **kw: subprocess.CompletedProcess(cmd, 0),
    )
    monkeypatch.setattr(
        reproduce, "compare_vs_table1",
        lambda f1_tol, informational, table="BENCHMARK_TABLE.txt": 1,
    )
    with pytest.raises(SystemExit) as e:
        reproduce.main(["--skip-download"])
    assert e.value.code == 1
