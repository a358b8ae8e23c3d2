"""The evidence-window auditor itself (tools/window_audit.py) must
catch a change whose dependent query sits past the driver's first-50
window — the failure mode that would silently invalidate prior-round
correctness evidence."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.window_audit import audit, registry_order  # noqa: E402


def _entry(n_queries: int) -> str:
    # q1..qN, each calling a helper from the fake package
    defs = "\n".join(
        f"def q{i}(spark, sf):\n    return helper_{'a' if i % 2 else 'b'}(spark)"
        for i in range(1, n_queries + 1)
    )
    reg = ",\n".join(f'    "q{i}": (q{i}, "SELECT 1")' for i in range(1, n_queries + 1))
    return f"{defs}\n\n_REGISTRY = {{\n{reg}\n}}\n"


BASE_PKG = "def helper_a(spark):\n    return 1\n\ndef helper_b(spark):\n    return 2\n"


def test_clean_tree_passes():
    base = {"__spark_entry__.py": _entry(6), "pkg/ops.py": BASE_PKG}
    report = audit(base, dict(base), window=4)
    assert report["ok"] and not report["changed_symbols"]


def test_changed_helper_past_window_is_violation():
    base = {"__spark_entry__.py": _entry(6), "pkg/ops.py": BASE_PKG}
    head = dict(base)
    # helper_b feeds the even queries; q6 sits past a window of 4
    head["pkg/ops.py"] = BASE_PKG.replace("return 2", "return 99")
    report = audit(base, head, window=4)
    assert not report["ok"]
    assert "helper_b" in report["changed_symbols"]
    assert report["violations"] == ["q6"]
    # q2 and q4 are affected too but inside the window
    assert report["affected_queries"]["q2"] == 2


def test_new_query_past_window_is_violation():
    base = {"__spark_entry__.py": _entry(4), "pkg/ops.py": BASE_PKG}
    head = {"__spark_entry__.py": _entry(5), "pkg/ops.py": BASE_PKG}
    report = audit(base, head, window=4)
    assert report["violations"] == ["q5"]


def test_module_constant_change_tracked():
    base = {
        "__spark_entry__.py": (
            "_SQL = 'SELECT 1'\n\ndef q1(spark, sf):\n    return _SQL\n\n"
            "_REGISTRY = {\n    \"q1\": (q1, _SQL)\n}\n"
        ),
    }
    head = {"__spark_entry__.py": base["__spark_entry__.py"].replace("SELECT 1", "SELECT 2")}
    report = audit(base, head, window=0)
    assert "_SQL" in report["changed_symbols"]
    assert report["violations"] == ["q1"]


def test_parameter_shadowing_is_not_a_reference():
    # a parameter that shares its name with a changed module symbol must
    # NOT create a phantom dependency edge (the q_knn 'queries' lesson)
    base = {
        "__spark_entry__.py": (
            "def q1(spark, sf):\n    return shadow(1, helper_b=2)\n\n"
            "def shadow(x, helper_b):\n    return helper_b\n\n"
            '_REGISTRY = {\n    "q1": (q1, "SELECT 1")\n}\n'
        ),
        "pkg/ops.py": BASE_PKG,
    }
    head = dict(base)
    head["pkg/ops.py"] = BASE_PKG.replace("return 2", "return 99")
    report = audit(base, head, window=0)  # ANY affected query would violate
    assert "helper_b" in report["changed_symbols"]
    assert report["ok"], report["affected_queries"]


def test_real_registry_parses_with_full_window():
    entry_src = (Path(__file__).resolve().parent.parent / "__spark_entry__.py").read_text()
    order = registry_order(entry_src)
    assert len(order) >= 50 and order[0].startswith("q_")
