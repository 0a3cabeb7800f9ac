"""Talent scheduling tests (optima from
/root/reference/ddo/examples/talentsched/tests.rs; objective = -best_value)."""

import pytest

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle
from ddo_tpu.models.talentsched import (
    TalentSched,
    TalentSchedRanking,
    TalentSchedRelax,
    read_instance,
)

RESOURCES = "/root/reference/resources/talentsched"

CASES = [("tiny", 29), ("tiny2", 9), ("small", 54), ("small2", 56)]


@pytest.mark.parametrize("fname,opt", CASES)
def test_instances(fname, opt):
    pb = read_instance(f"{RESOURCES}/{fname}")
    bundle = ModelBundle(pb, TalentSchedRelax(pb), TalentSchedRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(100), cache=ddo_tpu.SimpleCache(),
        cutset_type=ddo_tpu.FRONTIER, batch=2,
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert -solver.best_value() == opt
