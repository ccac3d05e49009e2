import sys; sys.path.insert(0, ".")  # noqa: E402
"""Rank Kamani basin-escape probe runs by the reference's own closed-loop
criterion and print the winning configuration's kamani_final.py overrides.

Each probe run (benchmarks/kamani_final.py) logs
    closed-loop traj rel err: a=0.5: X, a=1: Y, ...
every plot_every epochs (discovery/kamani.py:train).  This script parses the
LAST such line from each run's log.txt, scores by the mean relative
trajectory error across the amplitude sweep (reference discovery/kamani.py
:352-455 Lissajous overlays), and emits the winner's override string on
stdout (everything else goes to stderr) so a shell queue can do:

    FULL=$(python benchmarks/kamani_pick.py p_expb_lr4x p_corridor ...)
    python benchmarks/kamani_final.py full $FULL epochs=5000

A run with no closed-loop line yet (crashed early, still compiling) is
scored inf and reported as such.
"""

import os
import re

# probe name -> kamani_final.py overrides (MUST mirror the chain script)
PROBES = {
    "p_expb": "seed=10 exp_bias=-0.55",
    "p_expb_lr4x": "seed=10 exp_bias=-0.55 lr=2e-5",
    "p_corridor": "seed=10 exp_bias=-0.55 pnet_zero=1 pnet_scale=100",
    "p_corridor30": "seed=10 exp_bias=-0.55 pnet_zero=1 pnet_scale=30",
    "p_l1w": "seed=10 l1_warmup=150",
    # CPU control of the plain exp-bias rung (round-3 outage probe)
    "cpu_expb_s10": "seed=10 exp_bias=-0.55",
    "cpu_combo_s10": "seed=10 exp_bias=-0.55 exp_freeze=100 lr=2e-5",
}

LINE = re.compile(r"closed-loop traj rel err: (.*)")
PAIR = re.compile(r"a=([\d.]+): ([\d.eE+-]+|nan|inf)")


def score_run(name: str):
    path = os.path.join("logs", f"kamani_final_{name}", "log.txt")
    if not os.path.exists(path):
        return float("inf"), "no log"
    last = None
    with open(path) as f:
        for line in f:
            m = LINE.search(line)
            if m:
                last = m.group(1)
    if last is None:
        return float("inf"), "no closed-loop line"
    errs = [float(v) for _, v in PAIR.findall(last)]
    if not errs:
        return float("inf"), f"unparseable: {last!r}"
    mean = sum(errs) / len(errs)
    return mean, last.strip()


def main():
    names = sys.argv[1:] or list(PROBES)
    scored = []
    for n in names:
        s, detail = score_run(n)
        scored.append((s, n, detail))
        print(f"[pick] {n}: mean closed-loop err {s:.4f}  ({detail})",
              file=sys.stderr)
    scored.sort()
    scored = [s for s in scored if s[1] in PROBES] or scored
    best_score, best, _ = scored[0]
    if best_score == float("inf") or best not in PROBES:
        # nothing usable — fall back to the plain exp-bias rung (the
        # longest-horizon candidate with demonstrated p1-row escape)
        print("[pick] no probe has a closed-loop score; falling back to "
              "p_expb overrides", file=sys.stderr)
        best = "p_expb"
    print(f"[pick] winner: {best} (mean err {best_score:.4f})",
          file=sys.stderr)
    print(PROBES[best])


if __name__ == "__main__":
    main()
