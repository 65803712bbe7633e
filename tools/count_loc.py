#!/usr/bin/env python
"""Reproducible LoC count (ADVICE r4: pin the counted file set).

Counts non-test source lines: every git-tracked ``*.py``/``*.cpp``/``*.h``
outside ``tests/``.  Usage: ``python tools/count_loc.py``.
"""

import subprocess
import sys


def main():
    files = subprocess.check_output(["git", "ls-files"], text=True).split()
    src = [f for f in files
           if f.endswith((".py", ".cpp", ".h")) and not f.startswith("tests/")]
    total = 0
    for f in src:
        with open(f, "rb") as fh:
            total += sum(1 for _ in fh)
    print(f"{total} lines in {len(src)} non-test source files "
          "(git-tracked *.py/*.cpp/*.h outside tests/)")
    return total


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
