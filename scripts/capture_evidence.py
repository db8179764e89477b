"""One-shot on-chip evidence capture: run everything that needs the real
TPU and persist the outputs, so a brief window of tunnel availability is
enough to record the round's numbers (round 3 lost its only chip run to a
transient backend error).

    python scripts/capture_evidence.py [--out EVIDENCE.md]

Runs, in order, each under its own timeout and recorded even if later
stages fail:
  1. bench.py            -- headline JSON (has its own retry/watchdog)
  2. scripts/tpu_smoke.py -- parity/throughput battery incl. widening,
                             full-stream >=3x, pendulum B=4096 auto-W
  3. (--fuzz-log) splice in a pre-captured scripts/fuzz_gradients.py
     summary (CPU-only, ~2 h -- run it separately, pass its log here)
Writes a timestamped markdown transcript and echoes the bench JSON line.
"""
import argparse
import datetime
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, timeout):
    try:
        p = subprocess.run(
            cmd, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True, timeout=timeout,
        )
        return p.returncode, p.stdout
    except subprocess.TimeoutExpired as e:
        out = e.stdout or b""
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        return -1, out + f"\n[timeout after {timeout}s]"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "EVIDENCE_r05.md"))
    ap.add_argument("--fuzz-log", default=None,
                    help="path to a fuzz_gradients.py transcript to embed")
    args = ap.parse_args()

    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat()
    sections = [f"# On-chip evidence capture\n\ncaptured: {stamp}\n"]
    ok = True

    rc, out = run([sys.executable, "bench.py"], timeout=1800)
    sections.append(f"## bench.py (rc={rc})\n\n```\n{out.strip()}\n```\n")
    print(out.strip())
    ok &= rc == 0

    rc, out = run([sys.executable, "scripts/tpu_smoke.py"], timeout=2400)
    sections.append(
        f"## scripts/tpu_smoke.py (rc={rc})\n\n```\n{out.strip()}\n```\n"
    )
    print(out[-2000:].strip())
    ok &= rc == 0

    if args.fuzz_log and os.path.exists(args.fuzz_log):
        with open(args.fuzz_log) as f:
            lines = f.read().strip().splitlines()
        head = "\n".join(lines[:4])
        tail = "\n".join(lines[-6:])
        sections.append(
            "## scripts/fuzz_gradients.py (pre-captured, CPU f64)\n\n"
            f"```\n{head}\n...\n{tail}\n```\n")

    with open(args.out, "w") as f:
        f.write("\n".join(sections))
    print(f"wrote {args.out}; all green: {ok}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
