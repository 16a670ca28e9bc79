"""Response::from_outputs count parity vs the reference's own test
budget (circuit/program/src/response/from_outputs.rs:288
check_from_outputs(Private, 24849, 6, 13962, 13983)): 5 outputs
[constant struct, public struct, private struct, record,
external record], outputs injected OUTSIDE the measured scope."""
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def test_from_outputs_matches_reference_budget(capsys):
    import compare_from_outputs as C
    C.main()
    out = capsys.readouterr().out
    assert "delta:     constraints+0 private+0" in out, out
    assert "satisfied=True" in out, out
