"""Extended reference-parity integration suite.

Mirrors the reference's per-example `tests.rs` suites (SURVEY.md section 4,
tier 3): solve bundled benchmark instances end-to-end and assert the
published optima.  Every case here appears with the same optimum in
`/root/reference/ddo/examples/<problem>/tests.rs`.

Deselected by default (`addopts = -m 'not slow'` in pyproject.toml); run

    python -m pytest -m slow tests/slow -q

The fast per-model suites (tests/test_*.py) keep a small subset of these
plus brute-force oracles; this file is the breadth tier.
"""

import pytest

import ddo_tpu
from ddo_tpu import FixedWidth, ModelBundle, SimpleDominanceChecker

pytestmark = pytest.mark.slow

R = "/root/reference/resources"


# --------------------------------------------------------------------------
# knapsack (knapsack/tests.rs:66-200)
# --------------------------------------------------------------------------
KNAPSACK = [
    ("f1_l-d_kp_10_269", 295),
    ("f2_l-d_kp_20_878", 1024),
    ("f3_l-d_kp_4_20", 35),
    ("f4_l-d_kp_4_11", 23),
    ("f6_l-d_kp_10_60", 52),
    ("f7_l-d_kp_7_50", 107),
    ("f8_l-d_kp_23_10000", 9767),
    ("f9_l-d_kp_5_80", 130),
    ("f10_l-d_kp_20_879", 1025),
    ("knapPI_1_100_1000_1", 9147),
    ("knapPI_1_200_1000_1", 11238),
    ("knapPI_2_100_1000_1", 1514),
    ("knapPI_2_200_1000_1", 1634),
    ("knapPI_3_100_1000_1", 2397),
    ("knapPI_3_200_1000_1", 2697),
    ("knapPI_1_500_1000_1", 28857),
    ("knapPI_2_500_1000_1", 4566),
    ("knapPI_3_500_1000_1", 7117),
    ("knapPI_1_1000_1000_1", 54503),
    ("knapPI_2_1000_1000_1", 9052),
    ("knapPI_3_1000_1000_1", 14390),
    ("knapPI_1_2000_1000_1", 110625),
    ("knapPI_2_2000_1000_1", 18051),
    ("knapPI_3_2000_1000_1", 28919),
]


@pytest.mark.parametrize("fname,opt", KNAPSACK)
def test_knapsack(fname, opt):
    from ddo_tpu.models.knapsack import KPDominance, KPRanking, KPRelax, read_instance

    pb = read_instance(f"{R}/knapsack/{fname}")
    bundle = ModelBundle(pb, KPRelax(pb), KPRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(2), batch=8,
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
        dominance=SimpleDominanceChecker(KPDominance(), pb.nb_variables),
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert solver.best_value() == opt


# --------------------------------------------------------------------------
# MISP (misp/tests.rs, DIMACS .clq complements)
# --------------------------------------------------------------------------
MISP = [
    ("hamming6-2.clq", 32, 16),
    ("hamming6-4.clq", 4, 16),
    ("hamming8-2.clq", 128, 16),
    ("hamming8-4.clq", 16, 32),
    ("johnson8-2-4.clq", 4, 16),
    ("johnson8-4-4.clq", 14, 32),
    ("MANN_a9.clq", 16, 32),
    ("c-fat200-1.clq", 12, 16),
    ("c-fat200-2.clq", 24, 16),
    ("c-fat200-5.clq", 58, 16),
    ("c-fat500-1.clq", 14, 16),
    ("c-fat500-2.clq", 26, 16),
    ("keller4.clq", 11, 64),
    ("p_hat300-1.clq", 8, 64),
]


@pytest.mark.parametrize("fname,opt,width", MISP)
def test_misp(fname, opt, width):
    from ddo_tpu.models.misp import MispRanking, MispRelax, read_instance

    pb = read_instance(f"{R}/misp/{fname}")
    bundle = ModelBundle(pb, MispRelax(pb), MispRanking(pb))
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(width), batch=8,
        cutset_type=ddo_tpu.LAST_EXACT_LAYER,
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert solver.best_value() == opt


# --------------------------------------------------------------------------
# MAX2SAT (max2sat/tests.rs)
# --------------------------------------------------------------------------
MAX2SAT = [
    ("debug.wcnf", 24),
    ("debug2.wcnf", 13),
    ("pass.wcnf", 54),
    ("tautology.wcnf", 7),
    ("unit.wcnf", 6),
    ("negative_wt.wcnf", 4258),
    ("frb10-6-1.wcnf", 37037),
    ("frb10-6-2.wcnf", 38196),
    ("frb10-6-3.wcnf", 36671),
    ("frb10-6-4.wcnf", 38928),
]


@pytest.mark.parametrize("fname,opt", MAX2SAT)
def test_max2sat(fname, opt):
    from ddo_tpu.models.max2sat import Max2SatRanking, Max2SatRelax, read_instance

    pb = read_instance(f"{R}/max2sat/{fname}")
    bundle = ModelBundle(pb, Max2SatRelax(pb), Max2SatRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(8), batch=8, cache=ddo_tpu.SimpleCache(),
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert solver.best_value() == opt


# --------------------------------------------------------------------------
# MCP (mcp/tests.rs — all ten bundled n30 instances)
# --------------------------------------------------------------------------
MCP = [
    ("mcp_n30_p0.1_000.mcp", 13),
    ("mcp_n30_p0.1_001.mcp", 18),
    ("mcp_n30_p0.1_002.mcp", 15),
    ("mcp_n30_p0.1_003.mcp", 19),
    ("mcp_n30_p0.1_004.mcp", 16),
    ("mcp_n30_p0.1_005.mcp", 19),
    ("mcp_n30_p0.1_006.mcp", 12),
    ("mcp_n30_p0.1_007.mcp", 18),
    ("mcp_n30_p0.1_008.mcp", 20),
    ("mcp_n30_p0.1_009.mcp", 22),
]


@pytest.mark.parametrize("fname,opt", MCP)
def test_mcp(fname, opt):
    from ddo_tpu.models.mcp import McpRanking, McpRelax, read_instance

    pb = read_instance(f"{R}/mcp/{fname}")
    bundle = ModelBundle(pb, McpRelax(pb), McpRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(16), batch=8,
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert solver.best_value() == opt


# --------------------------------------------------------------------------
# TSPTW (tsptw/tests.rs — Langevin N20 suite; objective = -value/1e4)
# --------------------------------------------------------------------------
LANGEVIN = [
    ("N20ft301.dat", 661.60),
    ("N20ft302.dat", 703.00),
    ("N20ft303.dat", 746.40),
    ("N20ft304.dat", 817.00),
    ("N20ft305.dat", 724.70),
    ("N20ft306.dat", 729.50),
    ("N20ft307.dat", 691.80),
    ("N20ft308.dat", 788.20),
    ("N20ft309.dat", 751.80),
    ("N20ft310.dat", 693.80),
    ("N20ft401.dat", 660.90),
    ("N20ft402.dat", 701.00),
    ("N20ft403.dat", 746.40),
    ("N20ft404.dat", 817.00),
    ("N20ft405.dat", 724.70),
    ("N20ft406.dat", 728.50),
    ("N20ft407.dat", 691.80),
    ("N20ft408.dat", 786.10),
    ("N20ft409.dat", 749.80),
    ("N20ft410.dat", 693.80),
]


def _solve_tsptw(path, opt, decimals):
    """Shared TSPTW parity runner (one solver config for every suite)."""
    from ddo_tpu.models.tsptw import (
        TsptwDominance, TsptwRanking, TsptwRelax, TsptwWidth, read_instance,
    )

    pb = read_instance(path)
    bundle = ModelBundle(pb, TsptwRelax(pb), TsptwRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=TsptwWidth(pb.nb_variables, 1), batch=8,
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
        dominance=SimpleDominanceChecker(TsptwDominance(), pb.nb_variables),
        buffer_width=max(64, pb.nb_variables),
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert round(-solver.best_value() / 10000.0, decimals) == round(opt, decimals)


@pytest.mark.parametrize("fname,opt", LANGEVIN)
def test_tsptw_langevin(fname, opt):
    _solve_tsptw(f"{R}/tsptw/Langevin/{fname}", opt, 2)


# --------------------------------------------------------------------------
# TSPTW — SolomonPotvinBengio suite (tsptw/tests.rs solve_solomon_potvin_bengio
# asserts; objective = -value/1e4, 4-decimal parity with the reference)
# --------------------------------------------------------------------------
SOLOMON_PB = [
    ("rc_201.1.txt", 592.0611),
    ("rc_201.2.txt", 860.1748),
    ("rc_201.3.txt", 853.7075),
    ("rc_201.4.txt", 889.1761),
    ("rc_202.1.txt", 850.48),
    ("rc_202.2.txt", 338.5183),
    ("rc_202.3.txt", 894.1028),
    ("rc_202.4.txt", 853.7075),
    ("rc_203.1.txt", 488.4224),
    ("rc_203.2.txt", 853.7075),
    ("rc_203.3.txt", 921.4397),
    ("rc_203.4.txt", 338.5183),
    ("rc_204.1.txt", 917.83),
    ("rc_204.2.txt", 690.06),
    ("rc_204.3.txt", 455.0315),
    ("rc_205.1.txt", 417.8058),
    ("rc_205.2.txt", 820.1853),
    ("rc_205.3.txt", 950.0539),
    ("rc_205.4.txt", 837.7083),
    ("rc_206.1.txt", 117.8479),
    ("rc_206.2.txt", 870.4875),
    ("rc_206.3.txt", 650.5942),
    ("rc_206.4.txt", 911.9814),
    ("rc_207.1.txt", 804.6735),
    ("rc_207.2.txt", 713.90),
    ("rc_207.3.txt", 745.7717),
    ("rc_207.4.txt", 133.1421),
    ("rc_208.1.txt", 810.70),
    ("rc_208.2.txt", 579.51),
    ("rc_208.3.txt", 686.7954),
]


@pytest.mark.parametrize("fname,opt", SOLOMON_PB)
def test_tsptw_solomon_potvin_bengio(fname, opt):
    _solve_tsptw(f"{R}/tsptw/SolomonPotvinBengio/{fname}", opt, 4)


# --------------------------------------------------------------------------
# SOP (sop/tests.rs)
# --------------------------------------------------------------------------
SOP = [
    ("ESC07.sop", 2125),
    ("ESC11.sop", 2075),
    ("ESC12.sop", 1675),
    ("br17.10.sop", 55),
    ("br17.12.sop", 55),
]


@pytest.mark.parametrize("fname,opt", SOP)
def test_sop(fname, opt):
    from ddo_tpu.models.sop import SopRanking, SopRelax, SopWidth, read_instance

    pb = read_instance(f"{R}/sop/{fname}")
    bundle = ModelBundle(pb, SopRelax(pb), SopRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=SopWidth(pb.nb_variables, 1), batch=8,
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
        buffer_width=max(64, pb.nb_jobs),
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert -solver.best_value() == opt


# --------------------------------------------------------------------------
# SRFLP (srflp/tests.rs; objective decode mirrors main.rs)
# --------------------------------------------------------------------------
SRFLP = [
    ("Cl5", 1100.0),
    ("Cl6", 1990.0),
    ("Cl7", 4730.0),
    ("Cl8", 6295.0),
    ("S8", 801.0),
    ("S8H", 2324.5),
    ("S9", 2469.5),
    ("S9H", 4695.5),
    ("S10", 2781.5),
]


@pytest.mark.parametrize("fname,opt", SRFLP)
def test_srflp(fname, opt):
    from ddo_tpu.models.srflp import (
        SrflpRanking, SrflpRelax, SrflpWidth, read_instance,
    )

    pb = read_instance(f"{R}/srflp/{fname}")
    bundle = ModelBundle(pb, SrflpRelax(pb), SrflpRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=SrflpWidth(pb.nb_variables, 1), batch=8,
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
        buffer_width=max(64, pb.nb_variables),
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert -solver.best_value() + pb.root_value == opt


# --------------------------------------------------------------------------
# Talent scheduling (talentsched/tests.rs; objective = -best_value)
# --------------------------------------------------------------------------
TALENT = [
    ("tiny", 29),
    ("tiny2", 9),
    ("small", 54),
    ("small2", 56),
    ("concert", 111),
    ("film-10", 352),
    ("film-12", 401),
]


@pytest.mark.parametrize("fname,opt", TALENT)
def test_talentsched(fname, opt):
    from ddo_tpu.models.talentsched import (
        TalentSchedRanking, TalentSchedRelax, read_instance,
    )

    pb = read_instance(f"{R}/talentsched/{fname}")
    bundle = ModelBundle(pb, TalentSchedRelax(pb), TalentSchedRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(100), batch=8,
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert -solver.best_value() == opt


# --------------------------------------------------------------------------
# LCS (lcs/tests.rs)
# --------------------------------------------------------------------------
LCS = [
    ("neg_12_3_1.txt", 203),
    ("neg_12_3_3.txt", 358),
    ("neg_12_3_6.txt", 245),
    ("neg_12_3_8.txt", 268),
    ("poz_12_3_1.txt", 222),
]


@pytest.mark.parametrize("fname,opt", LCS)
def test_lcs(fname, opt):
    from ddo_tpu.models.lcs import (
        LcsDominance, LcsRanking, LcsRelax, read_instance,
    )

    pb = read_instance(f"{R}/lcs/{fname}")
    bundle = ModelBundle(pb, LcsRelax(pb), LcsRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(64), batch=8,
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
        dominance=SimpleDominanceChecker(LcsDominance(), pb.nb_variables),
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert solver.best_value() == opt


# --------------------------------------------------------------------------
# PSP (psp/tests.rs pattern: trailing instance line = known optimum)
# --------------------------------------------------------------------------
@pytest.mark.parametrize("idx", list(range(1, 11)))
def test_psp_2items(idx):
    from ddo_tpu.models.psp import PspRanking, PspRelax, read_instance

    pb, optimum = read_instance(f"{R}/psp/instancesWith2items/{idx}")
    assert optimum is not None
    bundle = ModelBundle(pb, PspRelax(pb), PspRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(8), batch=8, cache=ddo_tpu.SimpleCache(),
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert -solver.best_value() == optimum


@pytest.mark.parametrize("idx", list(range(1, 6)))
def test_psp_5items(idx):
    from ddo_tpu.models.psp import PspRanking, PspRelax, read_instance

    pb, optimum = read_instance(f"{R}/psp/instancesWith5items/{idx}")
    assert optimum is not None
    bundle = ModelBundle(pb, PspRelax(pb), PspRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(16), batch=8, cache=ddo_tpu.SimpleCache(),
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert -solver.best_value() == optimum


# --------------------------------------------------------------------------
# Golomb (golomb/tests.rs:66-88)
# --------------------------------------------------------------------------
@pytest.mark.parametrize("n,opt", [(2, 1), (3, 3), (4, 6), (5, 11), (6, 17), (7, 25), (8, 34)])
def test_golomb(n, opt):
    from ddo_tpu.models.golomb import Golomb, GolombRanking, GolombRelax

    pb = Golomb(n)
    bundle = ModelBundle(pb, GolombRelax(pb), GolombRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(10), batch=8,
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert solver.best_value() == -opt


# --------------------------------------------------------------------------
# ALP (alp/tests.rs — n25 single-runway family)
# --------------------------------------------------------------------------
ALP = [
    ("alp_n25_r1_c2_std10_s0", 755),
    ("alp_n25_r1_c2_std10_s1", 554),
    ("alp_n25_r1_c2_std10_s2", 637),
    ("alp_n25_r1_c2_std10_s3", 1503),
    ("alp_n25_r1_c2_std10_s4", 2985),
    ("alp_n25_r1_c2_std20_s0", 1213),
    ("alp_n25_r1_c2_std20_s1", 641),
]


@pytest.mark.parametrize("fname,opt", ALP)
def test_alp(fname, opt):
    from ddo_tpu.models.alp import (
        AlpDominance, AlpRanking, AlpRelax, read_instance,
    )

    pb = read_instance(f"{R}/alp/{fname}")
    bundle = ModelBundle(pb, AlpRelax(pb), AlpRanking())
    solver = ddo_tpu.SequentialSolver(
        bundle, width_heu=FixedWidth(64), batch=8,
        cache=ddo_tpu.SimpleCache(), cutset_type=ddo_tpu.FRONTIER,
        dominance=SimpleDominanceChecker(AlpDominance(), pb.nb_variables),
    )
    completion = solver.maximize()
    assert completion.is_exact
    assert -solver.best_value() == opt
