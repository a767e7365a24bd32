"""Benchmark CLI: problem grammar parsing + end-to-end runs with verify."""
import numpy as np
import pytest

from regent_fft_tpu import bench_cli


def test_parse_problem():
    p = bench_cli.parse_problem("ocf1024")
    assert (p.in_place, p.real, p.forward, p.sizes) == (False, False, True, (1024,))
    p = bench_cli.parse_problem("irb512x512")
    assert (p.in_place, p.real, p.forward, p.sizes) == (True, True, False, (512, 512))
    assert str(p) == "irb512x512"


@pytest.mark.parametrize("bad", ["xcf12", "oc1024", "ocf", "ocf12y3", ""])
def test_parse_rejects(bad):
    with pytest.raises(ValueError):
        bench_cli.parse_problem(bad)


@pytest.mark.parametrize("prob", ["ocf64", "ocb64", "orf64", "orb64", "ocf8x8"])
def test_run_problem_verifies(prob):
    res = bench_cli.run_problem(bench_cli.parse_problem(prob), iters=2, verify=True)
    assert res["verify"]["status"] == "PASS", res


def test_cli_main_smoke(capsys):
    rc = bench_cli.main(["ocf16", "--iters", "1", "--verify"])
    assert rc == 0
    assert "PASS" in capsys.readouterr().out


def test_cli_suite_smoke():
    rc = bench_cli.main(["--suite", "smoke", "--iters", "1", "--verify", "--json"])
    assert rc == 0
