"""CLI and graphviz-export smoke tests (aux parity: clean.rs:884-1090,
examples/visualisation/main.rs, examples/*/main.rs CLIs)."""

from ddo_tpu.utils.resources import resources_root as _res_root
import io
import contextlib

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle
from ddo_tpu.cli import main as cli_main
from ddo_tpu.core.types import CompilationType, root_subproblem
from ddo_tpu.engine.viz import VizConfig, as_graphviz
from ddo_tpu.models.knapsack import KPRanking, KPRelax, read_instance


def test_cli_knapsack(capsys):
    cli_main([
        "knapsack", _res_root() + "/knapsack/f3_l-d_kp_4_20",
        "--cpu", "-w", "4",
    ])
    out = capsys.readouterr().out
    assert "Objective:  35" in out
    assert "Aborted:    False" in out


def test_graphviz_export():
    pb = read_instance(_res_root() + "/knapsack/f3_l-d_kp_4_20")
    bundle = ModelBundle(pb, KPRelax(pb), KPRanking())
    solver = ddo_tpu.SequentialSolver(bundle, width_heu=FixedWidth(3))
    dd = solver.compiler.compile(
        CompilationType.RELAXED, root_subproblem(pb), ddo_tpu.NEG_INF, 3
    )
    dot = as_graphviz(dd, VizConfig())
    assert dot.startswith("digraph {")
    assert "terminal" in dot
    assert "->" in dot
    assert "val:" in dot and "rub:" in dot and "theta:" in dot
