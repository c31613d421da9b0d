"""Run the local replica of the driver's DuckDB-oracle gate as a test.

This is the primary correctness contract (BASELINE.md t2): every
oracle-checked registry query must match DuckDB exactly at the test SF.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


def test_oracle_gate(sf_dir):
    from check_oracle import run

    assert run(sf_dir) == 0
