"""Static policy fence: every localCheckpoint() in the library must be
eager. The lazy form is exposed to the ABBA deadlock between AQE's
shuffle-materialization thread and the DAG event loop recorded in
plans/r15/localcheckpoint_deadlock_jstack.txt (global
RDDCheckpointData$ lock vs the RDD lock, taken in opposite orders)."""

from __future__ import annotations

import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent
SOURCES = [REPO / "openset_spark", REPO / "__spark_entry__.py"]


def _py_files():
    for src in SOURCES:
        if src.is_file():
            yield src
        else:
            yield from sorted(src.rglob("*.py"))


def test_no_lazy_local_checkpoints():
    offenders = []
    for path in _py_files():
        text = path.read_text()
        for m in re.finditer(r"localCheckpoint\s*\(([^)]*)\)", text):
            if re.search(r"eager\s*=\s*False", m.group(1)):
                line = text[: m.start()].count("\n") + 1
                offenders.append(f"{path.relative_to(REPO)}:{line}")
    assert not offenders, (
        "lazy localCheckpoint(eager=False) sites found (ABBA deadlock "
        f"exposure — see module docstring): {offenders}"
    )
