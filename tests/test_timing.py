"""Timing-tree observability subsystem (utils/timing.py) — the profiling
layer SURVEY.md §5 lists as net-new vs the reference's RUST_LOG story."""

import time

import pytest

from blobstreamx_tpu.utils import timing


def setup_function(_):
    timing.reset()


def test_span_nesting_and_report():
    with timing.span("outer"):
        with timing.span("inner"):
            time.sleep(0.01)
        with timing.span("inner"):  # merged with count
            time.sleep(0.01)
    root = timing.tree()
    outer = root.children[0]
    assert outer.name == "outer" and outer.elapsed >= 0.02
    assert len(outer.children) == 1
    assert outer.children[0].count == 2
    rep = timing.report()
    assert "outer" in rep and "inner x2" in rep and "ms" in rep


def test_phases_marks():
    p = timing.phases("prove")
    p.mark("a")
    time.sleep(0.01)
    p.mark("b")
    time.sleep(0.02)
    p.end()
    prove = timing.tree().children[0]
    names = [c.name for c in prove.children]
    assert names == ["a", "b"]
    assert prove.children[1].elapsed >= 0.015
    assert prove.elapsed >= prove.children[0].elapsed + prove.children[1].elapsed


def test_disabled_is_noop():
    timing.enable(False)
    try:
        with timing.span("x"):
            pass
        p = timing.phases("y")
        p.mark("z")
        p.end()
        assert timing.tree().children == []
    finally:
        timing.enable(True)


@pytest.mark.proof
def test_prove_system_emits_phases():
    """Tiny single-table proof records the prover phase tree."""
    import numpy as np
    from blobstreamx_tpu.proof import stark, system
    from blobstreamx_tpu.chips import bytes as bytes_chip

    air = bytes_chip.BytesAir()
    trace = bytes_chip.build_trace(np.zeros(bytes_chip.N_ROWS,
                                            dtype=np.uint64))
    cfg = stark.StarkConfig(rate_bits=3, cap_height=0, num_query_rounds=2,
                            pow_bits=1, final_poly_bits=2)
    system.prove_system([system.TableSpec("bytes", air, trace, [])], cfg)
    names = {c.name for c in timing.tree().children}
    assert "prove_system" in names
    phases = [c.name for c in timing.tree().children[0].children]
    assert "main_commits" in phases and "deep_fri" in phases
