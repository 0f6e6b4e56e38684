"""Seed the persistent compilation cache for the test suite.

The pytest process itself runs the cache READ-only (see
tests/conftest.py: XLA:CPU's executable.serialize() segfaults in
long-lived many-compile processes).  This tool populates the cache
from SHORT-lived processes instead: one pytest subprocess per test
file, with writes re-enabled (RVST_TEST_CACHE_WRITES=1).  A subprocess
that still crashes mid-file is retried — every entry written before
the crash persists, so each retry gets strictly further; files that
keep crashing fall back to one process per test.

Run once per host family (the cache is keyed by a host-CPU
fingerprint, utils._host_cpu_fingerprint); afterwards plain
`python -m pytest tests/ -q` runs entirely off cache hits.
"""
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_pytest(target, timeout=7200):
    env = dict(os.environ, RVST_TEST_CACHE_WRITES='1')
    env.pop('RVST_COMPILE_CACHE_READONLY', None)
    targets = [target] if isinstance(target, str) else list(target)
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, '-m', 'pytest', *targets, '-q', '-p',
         'no:cacheprovider'], env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        timeout=timeout)
    return r.returncode, time.time() - t0, r.stdout.decode(
        errors='replace')


def collect_tests(fname):
    r = subprocess.run(
        [sys.executable, '-m', 'pytest', fname, '--collect-only', '-q'],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    return [ln.strip() for ln in r.stdout.decode().splitlines()
            if '::' in ln]


def main():
    files = sys.argv[1:] or sorted(
        glob.glob(os.path.join(REPO, 'tests', 'test_*.py')))
    failures = []
    # one per-file attempt: the serialize crash is deterministic at
    # the first uncached write past the accumulation threshold, so a
    # retry of the same file crashes at the same point — go straight
    # to chunks
    for f in files:
        ok = False
        for attempt in range(1):
            rc, dt, out = run_pytest(f)
            print(f'{os.path.basename(f)} attempt {attempt + 1}: '
                  f'rc={rc} ({dt:.0f}s)', flush=True)
            if rc == 0:
                ok = True
                break
        if not ok:
            # fall back to small groups of tests per process: session
            # fixtures rebuild once per group instead of once per
            # test, while per-process compile accumulation stays low
            print(f'{os.path.basename(f)}: falling back to chunked '
                  'seeding', flush=True)
            tests = collect_tests(f)
            chunk = 5
            for i in range(0, len(tests), chunk):
                group = tests[i:i + chunk]
                rc = dt = out = None
                for attempt in range(2):
                    rc, dt, out = run_pytest(group)
                    if rc == 0:
                        break
                print(f'  chunk {i // chunk}: rc={rc} ({dt:.0f}s)',
                      flush=True)
                if rc != 0:
                    failures.extend(group)
                    print(out[-2000:], flush=True)
    if failures:
        print('FAILED to seed:', failures, flush=True)
        return 1
    print('cache seeded', flush=True)
    return 0


if __name__ == '__main__':
    sys.exit(main())
