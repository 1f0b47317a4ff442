"""Round-end doc sync (VERDICT r4 weak 5 / next-round 7): rewrite the README
headline numbers from the newest recorded bench artifact and fail loudly on
stale round markers, so the doc-drift class dies mechanically.

Run before the final commit of a round:

    python tools/sync_docs.py          # rewrite + check, exit 1 on mismatch
    python tools/sync_docs.py --check  # check only (CI style)
"""

import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_bench():
    """(round, record, source) — bench.py's canonical-over-LOCAL precedence
    (one shared implementation; round-5 review finding)."""
    sys.path.insert(0, HERE)
    from bench import newest_recorded_bench

    rnd, rec, name = newest_recorded_bench(HERE)
    if not rec:
        raise SystemExit("no BENCH*_r*.json with a parsed value found")
    return rnd, rec, name


def _fmt_k(v: float) -> str:
    return f"~{int(round(v / 1000.0)) * 1000:,}"


def sync_readme(rnd: int, rec: dict, check: bool) -> bool:
    path = os.path.join(HERE, "README.md")
    src = open(path).read()
    gmm = rec["value"]
    mi = rec.get("mi_solves_per_s_per_chip")
    p50 = rec.get("p50_replan_latency_ms")
    p99 = rec.get("p99_replan_latency_ms")
    out = re.sub(
        r"\*\*~[\d,]+ solves/s/chip\*\* \(S=\d+; round \d+\)",
        f"**{_fmt_k(gmm)} solves/s/chip** (S={rec.get('batch', 4096)}; "
        f"round {rnd})",
        src,
    )
    if mi:
        out = re.sub(
            r"config 4\) \| \*\*~[\d,]+ solves/s/chip\*\*",
            f"config 4) | **{_fmt_k(mi)} solves/s/chip**",
            out,
        )
    if p50 is not None and p99 is not None:
        out = re.sub(
            r"\| single-scenario p50 replan latency \| \*\*[^*]+\*\*",
            f"| single-scenario p50 replan latency | "
            f"**{p50:.2g} ms (p99 {p99:.2g} ms)**",
            out,
        )
    if out != src:
        if check:
            print(f"README.md headline is STALE vs BENCH r{rnd}")
            return False
        open(path, "w").write(out)
        print(f"README.md headline rewritten from BENCH r{rnd}")
    else:
        print("README.md headline up to date")
    return True


def check_round_markers(rnd: int) -> bool:
    """ROADMAP must acknowledge the current round somewhere in its title or
    a section header; PERFORMANCE must have a section for this round."""
    ok = True
    roadmap = open(os.path.join(HERE, "docs", "ROADMAP.md")).read()
    m = re.search(r"end of round (\d+)", roadmap)
    if m and int(m.group(1)) < rnd:
        print(f"docs/ROADMAP.md title says 'end of round {m.group(1)}' "
              f"but newest bench is round {rnd}")
        ok = False
    perf = open(os.path.join(HERE, "docs", "PERFORMANCE.md")).read()
    if not re.search(rf"[Rr]ound {rnd}\b", perf):
        print(f"docs/PERFORMANCE.md has no 'Round {rnd}' section")
        ok = False
    return ok


def main():
    check = "--check" in sys.argv
    rnd, rec, src = newest_bench()
    print(f"newest bench: {src} (round {rnd}, "
          f"{rec['value']:,.0f} solves/s/chip)")
    ok = sync_readme(rnd, rec, check)
    ok = check_round_markers(rnd) and ok
    if not ok:
        sys.exit(1)
    print("docs in sync")


if __name__ == "__main__":
    main()
