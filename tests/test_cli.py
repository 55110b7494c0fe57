"""Reference-parity CLI surface (Main.hs cmdargs modes)."""

import gzip

import pytest

from stash_log_parser_spark import corpus
from stash_log_parser_spark.cli import main


@pytest.fixture(scope="module")
def log_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("clilogs")
    lines = list(corpus.gen_day_lines(0, 120, seed=13))
    with gzip.open(d / "atlassian-stash-access-2012-09-08.0.log.gz", "wt") as f:
        f.write("\n".join(lines) + "\n")
    return str(d)


def test_cli_repository_stats(log_file, capsys, spark):
    assert main(["repositoryStats", log_file]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "repo_slug|clones|fetches|shallow_clones|pushes|ref_advertisements"
    assert len(out) > 3
    assert all(len(line.split("|")) == 6 for line in out)


def test_cli_max_conn_and_counts(log_file, capsys, spark):
    assert main(["maxConn", log_file]) == 0
    max_conn = int(capsys.readouterr().out.strip().splitlines()[1])
    assert max_conn >= 1
    assert main(["countRequests", log_file]) == 0
    header, row = capsys.readouterr().out.strip().splitlines()
    total, parsed, malformed = map(int, row.split("|"))
    assert total == parsed + malformed and parsed > 200


def test_cli_date_filter_excludes_everything(log_file, capsys, spark):
    assert main(["gitOperations", log_file, "--since", "2013-01-01"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1  # header only


def test_cli_tokenized_input(capsys, spark, tmp_path):
    p = str(tmp_path / "c.parquet")
    corpus.write_corpus(p, n_requests_per_day=100, n_days=1, seed=3)
    assert main(["protocolStats", "--tokenized", p]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "hour|ssh|http"
    assert len(out) > 5
