"""The per-analysis CLI (plans/analyze.py) — the reference's
`logparser <mode> files...` UX (Main.hs dispatch + Output.hs stdout)."""

import gzip
import os

import pytest

from stash_log_parser_spark.plans import analyze


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    from stash_log_parser_spark.corpus import generate_spark

    d = tmp_path_factory.mktemp("analyze_cli")
    rows = generate_spark(spark, 400, 2, seed=9).select("line", "day").collect()
    days = sorted({r.day for r in rows})
    # one plain file, one gzipped — S1/S2 through the CLI front door
    for i, day in enumerate(days):
        lines = [r.line for r in rows if r.day == day]
        name = f"atlassian-stash-access-{day}.0.log" + (".gz" if i else "")
        opener = gzip.open if i else open
        with opener(os.path.join(d, name), "wt") as f:
            f.write("\n".join(lines) + "\n")
    return str(d)


def test_cli_gitoperations_pipe_output(spark, log_dir, capsys):
    rc = analyze.main(["gitOperations", os.path.join(log_dir, "*")])
    assert rc == 0
    out = [l for l in capsys.readouterr().out.splitlines() if l]
    assert out, "no rows printed"
    # hour + 5 ops × hit/miss = 11 pipe-separated columns (A5 shape)
    assert all(len(l.split("|")) == 11 for l in out)


def test_cli_since_filters_files(spark, log_dir, capsys):
    days = sorted(
        {n.split("access-")[1][:10] for n in os.listdir(log_dir)}
    )
    analyze.main(["countRequests", os.path.join(log_dir, "*")])
    total = int(capsys.readouterr().out.strip().split("|")[0])
    analyze.main(
        ["countRequests", os.path.join(log_dir, "*"), "--since", days[1]]
    )
    later = int(capsys.readouterr().out.strip().split("|")[0])
    assert 0 < later < total


def test_cli_parquet_input_matches_operator(spark, capsys):
    corpus = "data/log_corpus_small.parquet"
    analyze.main(["protocolStats", corpus, "--format", "csv"])
    out = dict(
        l.split(",") for l in capsys.readouterr().out.splitlines() if l
    )
    from stash_log_parser_spark.functions.parse import parse_corpus
    from stash_log_parser_spark.operators import analyses as A

    want = {
        r.protocol: str(r.n)
        for r in A.protocol_counts(
            parse_corpus(spark.read.parquet(corpus))
        ).collect()
    }
    assert out == want


def test_cli_rejects_table_format_with_output(tmp_path):
    """--format table + --output is an argparse error (exit 2), not a
    silent exit-0 with an unwritten file (round-2 advice)."""
    import pytest

    out = str(tmp_path / "plot.dat")
    with pytest.raises(SystemExit) as e:
        analyze.main(
            ["protocolStats", "data/log_corpus_small.parquet",
             "--format", "table", "--output", out]
        )
    assert e.value.code == 2
    import os

    assert not os.path.exists(out)


def test_cli_top_limits_rows(spark, log_dir, capsys):
    """--top N (SURVEY §3.6 O2): first N rows of the mode's own
    ordering — the full run's prefix, not a different ordering."""
    rc = analyze.main(["repositoryStats", os.path.join(log_dir, "*")])
    assert rc == 0
    full = [l for l in capsys.readouterr().out.splitlines() if l]
    rc = analyze.main(["repositoryStats", os.path.join(log_dir, "*"), "--top", "3"])
    assert rc == 0
    top = [l for l in capsys.readouterr().out.splitlines() if l]
    assert top == full[:3]


def test_cli_top_rejects_nonpositive(log_dir):
    with pytest.raises(SystemExit):
        analyze.main(["repositoryStats", os.path.join(log_dir, "*"), "--top", "0"])


def test_cli_via_stashlog_matches_text_front_door(spark, log_dir, capsys):
    """The same .log/.log.gz archive read through --via stashlog (the
    custom Python Data Source) must print EXACTLY what the text front
    door prints — the reference-UX surface now covers the data source
    end-to-end (round-4 verdict item)."""
    analyze.main(["gitOperations", os.path.join(log_dir, "*")])
    via_text = capsys.readouterr().out
    analyze.main(["gitOperations", log_dir, "--via", "stashlog"])
    via_ds = capsys.readouterr().out
    assert via_ds == via_text and via_text.strip()


def test_cli_export_logs_roundtrips_the_archive(spark, log_dir, tmp_path, capsys):
    """--export-logs re-emits the date-filtered raw lines through the
    stashlog staged-rename writer; re-analyzing the exported archive
    gives identical output (write path wired into the CLI surface)."""
    days = sorted({n.split("access-")[1][:10] for n in os.listdir(log_dir)})
    out_dir = str(tmp_path / "sliced")
    analyze.main(
        [
            "countRequests",
            os.path.join(log_dir, "*"),
            "--since",
            days[1],
            "--export-logs",
            out_dir,
            "--export-compression",
            "none",
        ]
    )
    direct = capsys.readouterr().out
    # exported files are visible (no dotfiles) and day-sharded
    names = sorted(os.listdir(out_dir))
    assert names and all(n.startswith("stash-access-") for n in names)
    assert all(days[1] in n or n > f"stash-access-{days[1]}" for n in names)
    # re-analyze the exported archive through the data source
    analyze.main(["countRequests", out_dir, "--via", "stashlog"])
    replay = capsys.readouterr().out
    assert replay == direct
