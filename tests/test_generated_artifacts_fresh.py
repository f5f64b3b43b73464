"""Generated artifacts must be current with the schema registry.

The reference regenerates op signatures and checks them in CI
(``dali/python/nvidia/dali/ops/_signatures.py`` +
``dali/test/python/type_annotations/``). Here the analogue: regenerate the
fn ``.pyi`` stubs and ``docs/operators.md`` into a tmpdir and diff against
the checked-in copies — a schema edit without ``tools/gen_stubs.py`` /
``tools/gen_op_docs.py`` fails this test instead of silently drifting.
"""

import filecmp
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _pyi_tree(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".pyi"):
                p = os.path.join(dirpath, f)
                out[os.path.relpath(p, root)] = p
    return out


def test_fn_stubs_are_current(tmp_path):
    import gen_stubs

    gen_stubs.main(root=str(tmp_path))
    fresh = _pyi_tree(str(tmp_path))
    checked_in = _pyi_tree(os.path.join(REPO, "dali_tpu", "fn"))
    assert set(fresh) == set(checked_in), (
        f"stub file set drift: only-fresh={sorted(set(fresh) - set(checked_in))}, "
        f"only-checked-in={sorted(set(checked_in) - set(fresh))} — "
        f"run `python tools/gen_stubs.py`")
    stale = [rel for rel in sorted(fresh)
             if not filecmp.cmp(fresh[rel], checked_in[rel], shallow=False)]
    assert not stale, f"stale stubs {stale} — run `python tools/gen_stubs.py`"


def test_op_docs_are_current(tmp_path):
    import gen_op_docs

    out = str(tmp_path / "operators.md")
    gen_op_docs.main(out=out)
    with open(out) as f:
        fresh = f.read()
    with open(os.path.join(REPO, "docs", "operators.md")) as f:
        checked_in = f.read()
    assert fresh == checked_in, (
        "docs/operators.md is stale — run `python tools/gen_op_docs.py`")
