"""Run the FULL test suite (slow included), one pytest process per test
file, and write an aggregated log.

One process per file because the full single-process run is
compile-dominated (hundreds of distinct XLA:CPU programs) and has
segfaulted inside ``backend_compile_and_load`` late in the run —
process isolation bounds compiler state while the persistent compile
cache (tests/conftest.py) keeps repeated invocations warm.

Usage: python scripts/run_full_suite.py [outfile]
"""

import glob
import os
import subprocess
import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "TESTLOG_full.txt"
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=8")

files = sorted(glob.glob("tests/test_*.py"))
t0 = time.time()
lines = []
totals = {"passed": 0, "failed": 0, "error": 0}
for f in files:
    start = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "pytest", f, "-q", "-m", "slow or not slow",
         "--durations=5", "-p", "no:cacheprovider"],
        env=ENV, capture_output=True, text=True)
    dur = time.time() - start
    tail = "\n".join(r.stdout.strip().splitlines()[-14:])
    status = "OK" if r.returncode == 0 else f"RC={r.returncode}"
    lines.append(f"===== {f} [{status}, {dur:.0f}s] =====\n{tail}\n")
    print(f"{f}: {status} ({dur:.0f}s)", flush=True)
    summary = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
    import re
    for key in totals:
        m = re.search(rf"(\d+) {key}", summary)
        if m:
            totals[key] += int(m.group(1))
    if r.returncode != 0:
        lines.append("----- stderr tail -----\n"
                     + "\n".join(r.stderr.strip().splitlines()[-20:]) + "\n")

header = (f"# Full test suite (slow included), per-file processes\n"
          f"# host: {os.uname().nodename} ({os.cpu_count()} cpus), "
          f"wall {time.time() - t0:.0f}s\n"
          f"# totals: {totals['passed']} passed, {totals['failed']} failed, "
          f"{totals['error']} errors\n\n")
with open(OUT, "w") as fh:
    fh.write(header + "\n".join(lines))
print(header)
