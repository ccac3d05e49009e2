import sys; sys.path.insert(0, ".")  # noqa: E402
"""Rank Kamani basin-escape probe runs and print the winning
configuration's kamani_final.py overrides.

Each probe run (benchmarks/kamani_final.py) logs every epoch the learned
param matrix, and every plot_every epochs
    closed-loop traj rel err: a=0.5: X, a=1: Y, ...
(discovery/kamani.py:train).  Scoring is two-stage because the closed-loop
error at a FIXED small epoch count is not monotone in eventual success: a
lazy-basin endpoint scores a finite ~0.2 while a mid-escape run (p1 row
halfway from 0 to the true 94) can transiently score worse.

  stage 1: if any run's mean closed-loop error beats GOOD_ERR (clearly
           better than the lazy basin's ~0.2), pick the minimum.
  stage 2: otherwise pick the run whose p1 row (the sigma_t-equation
           coefficient row, true value (0, 94, 27.93)) has grown farthest
           from the lazy pin at 0 — the escape signature identified by the
           round-3 basin study (VALIDATION.md).

Winner's override string goes to stdout (everything else to stderr) so a
shell queue can do:

    FULL=$(python benchmarks/kamani_pick.py p_expb_lr4x p_corridor ...)
    python benchmarks/kamani_final.py full $FULL epochs=5000

A run with no usable log is scored (inf, 0) and can never win unless all
are unusable, in which case the plain exp-bias rung is the fallback.
"""

import os
import re

# probe name -> kamani_final.py overrides (MUST mirror the chain script)
PROBES = {
    "p_expb": "seed=10 exp_bias=-0.55",
    "p_expb_lr4x": "seed=10 exp_bias=-0.55 lr=2e-5",
    "p_corridor": "seed=10 exp_bias=-0.55 pnet_zero=1 pnet_scale=100",
    "p_corridor30": "seed=10 exp_bias=-0.55 pnet_zero=1 pnet_scale=30",
    # corridor + exponent freeze: the CPU corridor probe showed the exp net
    # overshooting to the tanh saturation bound (-1.94 vs true -1) during
    # the violent early row-growth phase; freezing the exponents at the
    # biased init until the rows reach scale keeps them interior
    "p_corridor_f50": ("seed=10 exp_bias=-0.55 pnet_zero=1 pnet_scale=100 "
                       "exp_freeze=50"),
    "p_l1w": "seed=10 l1_warmup=150",
    # CPU controls (round-3 outage probes)
    "cpu_expb_s10": "seed=10 exp_bias=-0.55",
    "cpu_combo_s10": "seed=10 exp_bias=-0.55 exp_freeze=100 lr=2e-5",
    "cpu_corridor_s10": "seed=10 exp_bias=-0.55 pnet_zero=1 pnet_scale=100",
    "cpu_corridor_f50_s10": ("seed=10 exp_bias=-0.55 pnet_zero=1 "
                             "pnet_scale=100 exp_freeze=50"),
    # anti-saturation rungs (round 3, late): keep the exponents near the
    # biased near-true init while the corridor drives the row growth
    "cpu_corridor_elr_s10": ("seed=10 exp_bias=-0.55 pnet_zero=1 "
                             "pnet_scale=100 exp_lr_scale=0.05"),
    "cpu_corridor_tether_s10": ("seed=10 exp_bias=-0.55 pnet_zero=1 "
                                "pnet_scale=100 exp_l2=0.03"),
    # rescue probe: the corridor checkpoint (epoch ~200, exps saturated at
    # -1.98) resumed WITH the tether — if it wins, a fresh full run uses
    # the same corridor+tether overrides from epoch 0
    "cpu_corridor_rescue_s10": ("seed=10 exp_bias=-0.55 pnet_zero=1 "
                                "pnet_scale=100 exp_l2=0.03"),
}

GOOD_ERR = 0.12  # clearly better than the lazy basin's ~0.2 plateau

CL_LINE = re.compile(r"closed-loop traj rel err: (.*)")
CL_PAIR = re.compile(r"a=([\d.]+): ([\d.eE+-]+|nan|inf)")
PARAM = re.compile(r"(?<!True )param \[\[(.*?)\]\]", re.S)
EXPS = re.compile(r"(?<!True )exps? \[\[(.*?)\]\]", re.S)
NUM = re.compile(r"[-+]?\d*\.?\d+(?:[eE][-+]?\d+)?")
TRUE_EXPS = (-1.0, -0.584)  # every row of the true Kamani model


def scan_run(name: str):
    """-> (mean closed-loop err, p1-row escape magnitude, detail str)."""
    path = os.path.join("logs", f"kamani_final_{name}", "log.txt")
    if not os.path.exists(path):
        return float("inf"), 0.0, "no log"
    txt = open(path).read()
    last_cl = None
    for m in CL_LINE.finditer(txt):
        last_cl = m.group(1)
    err = float("inf")
    if last_cl:
        vals = [float(v) for _, v in CL_PAIR.findall(last_cl)]
        if vals:
            err = sum(vals) / len(vals)
    escape = 0.0
    params = PARAM.findall(txt)
    if params:
        nums = [float(x) for x in NUM.findall(params[-1])]
        if len(nums) >= 12:
            # p1 row = entries 3..5; true (0, 94, 27.93) — escape magnitude
            # is how far the two lazily-pinned columns have grown
            escape = abs(nums[4]) + abs(nums[5])
    # exponent health: mean |er - true| over the p1 row's two exponents
    # (entries 2..3 of the 4x2 block) — tanh-saturated exponents (-1.98 vs
    # true (-1, -0.584)) floor the closed-loop error even with a full
    # escape, so among equal escapes the healthier exponents must win
    exp_dist = float("inf")
    exps = EXPS.findall(txt)
    if exps:
        enums = [float(x) for x in NUM.findall(exps[-1])]
        if len(enums) >= 4:
            exp_dist = (abs(enums[2] - TRUE_EXPS[0])
                        + abs(enums[3] - TRUE_EXPS[1])) / 2
    detail = (f"cl={last_cl.strip() if last_cl else 'none'} "
              f"escape={escape:.3f} exp_dist={exp_dist:.3f}")
    return err, escape, exp_dist, detail


def main():
    names = sys.argv[1:] or list(PROBES)
    rows = []
    for n in names:
        if n not in PROBES:
            print(f"[pick] {n}: unknown probe name, skipping", file=sys.stderr)
            continue
        err, escape, exp_dist, detail = scan_run(n)
        rows.append((err, escape, exp_dist, n))
        print(f"[pick] {n}: mean closed-loop err {err:.4f}  {detail}",
              file=sys.stderr)
    good = [r for r in rows if r[0] < GOOD_ERR]
    if good:
        best = min(good)[3]
        why = f"closed-loop err {min(good)[0]:.4f} < {GOOD_ERR}"
    elif rows and max(r[1] for r in rows) > 0:
        # escape fallback with an exponent-health tie-breaker: among runs
        # within 10% of the best escape, smallest |er - true| wins
        top = max(r[1] for r in rows)
        near = [r for r in rows if r[1] >= 0.9 * top]
        pick = min(near, key=lambda r: r[2])
        best = pick[3]
        why = (f"escape {pick[1]:.3f} (>=90% of best {top:.3f}), "
               f"healthiest exponents (dist {pick[2]:.3f})")
    else:
        best, why = "p_expb", "no usable probe; exp-bias fallback"
    print(f"[pick] winner: {best} ({why})", file=sys.stderr)
    print(PROBES[best])


if __name__ == "__main__":
    main()
