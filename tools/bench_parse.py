#!/usr/bin/env python3
"""Robust Bench stdout parser — the sentinel contract made executable.

The driver (and any local loop) should take the LAST stdout line matching
the sentinel regex ^\\{"metric":"total" rather than the literal last line:
Bench prints the JSON line last, but a late executor-shutdown WARN landing
after it would otherwise break the parse the way sbt's [info] prefix broke
round 6 (BENCH_r06 parsed: null).

Usage:
  <bench stdout> | python3 tools/bench_parse.py    # pretty JSON, exit 1 if no line
  python3 tools/bench_parse.py --selftest          # parse survives trailing noise

bench_out.json always carries the complete map either way; this parser is
for the stdout channel only.
"""
import json
import re
import sys

SENTINEL = re.compile(r'^\{"metric":"total"')


def parse(lines):
    for line in reversed(list(lines)):
        line = re.sub(r"^\[info\] ", "", line.strip())  # sbt prefix tolerated
        if SENTINEL.match(line):
            return json.loads(line)
    return None


def selftest():
    sample = '{"metric":"total","value":33.4,"unit":"sec","runs":3,"queries":{"q1":0.5},"med":{"q1":0.6},"sf":"/x"}'
    cases = [
        # clean tail
        ["noise", sample],
        # trailing WARN after the JSON line (the r6-class failure mode)
        [sample, "26/08/13 WARN ShutdownHookManager: Shutdown hook called"],
        # sbt [info]-prefixed JSON line plus trailing noise
        ["[info] " + sample, "WARN executor shutdown"],
        # two candidate lines: the LAST one wins
        [sample.replace("33.4", "1.0"), sample, "WARN tail"],
    ]
    for i, lines in enumerate(cases):
        got = parse(lines)
        assert got is not None and got["value"] == 33.4, (i, got)
    assert parse(["only", "noise"]) is None
    print("selftest OK: parse survives trailing WARN / sbt-prefix / multi-line tails")


if __name__ == "__main__":
    if "--selftest" in sys.argv:
        selftest()
    else:
        d = parse(sys.stdin.read().splitlines())
        if d is None:
            print("no bench JSON line found", file=sys.stderr)
            sys.exit(1)
        json.dump(d, sys.stdout, indent=2)
        print()
