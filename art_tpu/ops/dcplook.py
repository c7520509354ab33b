"""DCP step-2 look/tone as a pipeline step.

The reference applies a DCP input profile in two stages: the matrices +
HueSatMap run at colorspace conversion (``dcp.cc:1363``), while the look
table, embedded tone curve and baseline exposure offset run *inside* the
op chain — at the head of STAGE_2 when ``icm.dcp_look_early`` is set
(``improcfun.cc:590-592``) or in STAGE_3 between saturationVibrance and
filmSimulation otherwise (``:614-620``). The develop planner stashes the
planned step-2 tables in ``ctx["dcp_step2"]``; this op places them at
the right chain position.
"""

from __future__ import annotations


def _plan(pp, ctx, early: bool):
    step2 = ctx.get("dcp_step2")
    if step2 is None:
        return None
    if bool(pp.icm.dcp_look_early) != early:
        return None
    static, op_data = step2
    return static, op_data


def plan_early(pp, ctx):
    return _plan(pp, ctx, True)


def plan_late(pp, ctx):
    return _plan(pp, ctx, False)


plan = plan_late


def apply(rgb, data, static):
    from art_tpu.color.dcp import apply_dcp_look

    return apply_dcp_look(rgb, data, static)
