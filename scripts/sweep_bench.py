"""Sequential config sweep over quick_bench (ONE axon client at a time).

Each config runs in its own subprocess (env knobs bind at import time).
Usage: python scripts/sweep_bench.py [size] [spp]
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("rows16", {"VPT_SUPER_ROWS": "16"}),
    ("rows4", {"VPT_SUPER_ROWS": "4"}),
    ("rows32", {"VPT_SUPER_ROWS": "32"}),
]


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "512"
    spp = sys.argv[2] if len(sys.argv) > 2 else "4"
    results = []
    for label, env_add in CONFIGS:
        env = dict(os.environ)
        env.update(env_add)
        print(f"=== {label}: {env_add} ===", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "quick_bench.py"),
             size, spp, "colonnade"],
            env=env, cwd=REPO, capture_output=True, text=True, timeout=2700,
        )
        out = proc.stdout.strip().splitlines()
        for line in out[-5:]:
            print("   ", line, flush=True)
        res = [l for l in out if l.startswith("RESULT")]
        results.append((label, res[-1] if res else "FAILED"))
        if proc.returncode != 0:
            print(proc.stderr[-1500:], flush=True)
    print("\n=== sweep summary ===")
    for label, res in results:
        print(f"{label:20s} {res}")


if __name__ == "__main__":
    main()
