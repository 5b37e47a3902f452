"""CLI, rules loading, and report sinks (reference parity surfaces)."""

import os

from engine.audit import CheckResult, CheckStatus, summarize
from engine.report import CSVReporter, HTMLReporter
from engine.rules import load_rules, quality_thresholds


def _results():
    return [
        CheckResult("QF-1", "quality", "desc one", "corpus", None,
                    CheckStatus.PASS, 100, 0, 0.0, {"a": 1}),
        CheckResult("QF-2", "quality", "desc two", "corpus", "content",
                    CheckStatus.FAIL, 100, 7, 0.07, {"b": "x"}),
        CheckResult("QF-3", "lineage", "desc three", "corpus", None,
                    CheckStatus.WARNING, 100, 2, 0.02, {}),
    ]


def test_summarize_parity():
    s = summarize(_results())
    assert s == {"total_checks": 3, "passed": 1, "failed": 1, "warnings": 1,
                 "errors": 0, "pass_rate": 33.33}


def test_csv_report(tmp_path):
    path = CSVReporter(str(tmp_path)).generate(_results(), summarize(_results()))
    raw = open(path, encoding="utf-8-sig").read()
    lines = raw.splitlines()
    assert lines[0].startswith("rule_id,check_type")
    assert any("QF-2" in l and "FAIL" in l for l in lines)
    assert any(l.startswith("summary") for l in lines)
    assert any(l.startswith("pass_rate") for l in lines)


def test_html_report(tmp_path):
    path = HTMLReporter(str(tmp_path)).generate(_results(), summarize(_results()))
    doc = open(path).read()
    for frag in ["QF-1", "QF-2", "FAIL", "pass rate", "<table>"]:
        assert frag in doc
    # one section per check_type
    assert doc.count("<h2>") == 2


def test_load_rules_enabled_filter(tmp_path):
    rules_dir = tmp_path / "rules"
    rules_dir.mkdir()
    (rules_dir / "null_rules.yml").write_text(
        "null_rules:\n"
        "  - {rule_id: A, enabled: true}\n"
        "  - {rule_id: B, enabled: false}\n"
        "  - {rule_id: C}\n"
    )
    rules = load_rules(str(tmp_path))
    assert [r["rule_id"] for r in rules["null"]] == ["A", "C"]


def test_quality_thresholds_from_repo_config():
    th = quality_thresholds()
    assert th["min_chars"] == 10
    assert th["max_ppl"] == 100.0
    assert th["known_langs"] == ("python", "javascript", "c", "markdown", "text")


def test_cli_end_to_end(ray_session, tmp_path):
    """Exit 0, committed partitions, reports written; resume run exits 0
    computing nothing (uses the in-process Ray session)."""
    from engine import corpus
    from engine.main import main

    in_dir = str(tmp_path / "in")
    corpus.write_corpus(in_dir, 2000, num_blocks=4)
    out_dir = str(tmp_path / "out")
    report_dir = str(tmp_path / "reports")

    code = main(["--input", in_dir, "--output", out_dir, "--parts", "2",
                 "--report-dir", report_dir])
    assert code == 0
    assert os.path.exists(os.path.join(out_dir, "_manifest", "summary.json"))
    assert len(os.listdir(report_dir)) == 2

    code2 = main(["--input", in_dir, "--output", out_dir, "--parts", "2",
                  "--report", "none", "--report-dir", report_dir])
    assert code2 == 0


def test_cli_bad_input_exit_2():
    from engine.main import main

    assert main(["--input", "/nonexistent/xyz", "--output", "/tmp/x",
                 "--report", "none"]) == 2


def test_audit_sink_roundtrip(ray_session, tmp_path):
    from engine.audit import read_history, write_results

    adir = str(tmp_path / "audit")
    write_results(_results(), adir, "run1")
    write_results(_results()[:2], adir, "run2")
    ds = read_history(adir)
    assert ds.count() == 5
    runs = {r["run_id"] for r in ds.select_columns(["run_id"]).take_all()}
    assert runs == {"run1", "run2"}
    row = ds.take(1)[0]
    for col in ["rule_id", "status", "violation_ratio", "details", "executed_at"]:
        assert col in row


def test_shell_wrapper_exit_code_mapping(ray_session, tmp_path):
    """scripts/run_pipeline.sh (SURVEY §2.11 ops entry, reference
    run_validation.sh analogue) forwards the engine CLI's exit code:
    validate on the sf tables exits 1 (known planted FAIL rule)."""
    import subprocess

    r = subprocess.run(
        ["bash", "scripts/run_pipeline.sh", "--", "validate",
         "--tables", "/root/testdata/sf0.001", "--report", "none",
         "--report-dir", str(tmp_path)],
        cwd="/root/repo", capture_output=True, text=True,
        env={**__import__("os").environ, "PIPELINE_LOG_DIR": str(tmp_path)},
        timeout=300,
    )
    assert r.returncode == 1, r.stdout[-2000:] + r.stderr[-2000:]
    assert "FAIL: failing checks present" in r.stdout
    assert list(tmp_path.glob("run_*.log"))  # log tee'd
