import numpy as np
import pytest
from click.testing import CliRunner

from pdb2reaction_tpu.cli import cli
from pdb2reaction_tpu.runtime.checkpoint import CheckpointStore, content_key

H3A = "3\nreactant\nH 0.0 0.0 0.0\nH 0.686 0.0 0.0\nH 2.4 0.0 0.0\n"
H3B = "3\nproduct\nH 0.0 0.0 0.0\nH 1.714 0.0 0.0\nH 2.4 0.0 0.0\n"
COMMON = ["-q", "0", "--calc-mode", "morse", "--freeze-atoms", "0,2"]


def test_store_roundtrip(tmp_path):
    store = CheckpointStore(tmp_path / "ck")
    meta = {"energies": [1.0, 2.0], "hei_idx": 1}
    arrays = {"images": np.arange(12.0).reshape(2, 2, 3)}
    store.save("seg_a", meta, arrays)
    assert store.has("seg_a")
    m, a = store.load("seg_a")
    assert m["hei_idx"] == 1
    np.testing.assert_allclose(a["images"], arrays["images"])
    store.delete("seg_a")
    assert not store.has("seg_a")
    assert store.load("missing") is None


def test_content_key_sensitivity():
    a = np.zeros((3, 3))
    b = a.copy()
    b[0, 0] = 1e-9
    assert content_key(a) == content_key(a.copy())
    assert content_key(a) != content_key(b)
    assert content_key(a, extra="gsm") != content_key(a, extra="dmf")


def test_path_search_resume_uses_memo(tmp_path):
    a = tmp_path / "A.xyz"
    b = tmp_path / "B.xyz"
    a.write_text(H3A)
    b.write_text(H3B)
    out = tmp_path / "ps"
    args = ["path-search", "-i", str(a), "-i", str(b), "--max-nodes", "6",
            "--out-dir", str(out)] + COMMON
    r1 = CliRunner().invoke(cli, args)
    assert r1.exit_code == 0, r1.output
    assert any((out / "checkpoint").glob("mep_*.json"))
    # second run resumes the completed segments from the memo
    r2 = CliRunner().invoke(cli, args)
    assert r2.exit_code == 0, r2.output
    assert "restored from checkpoint" in r2.output


def test_content_key_shape_and_split_sensitivity():
    import numpy as np
    a = np.arange(12, dtype=float)
    # same bytes, different shape -> different key
    assert content_key(a) != content_key(a.reshape(3, 4))
    # same concatenated bytes, different split across varargs -> different key
    assert content_key(a[:6], a[6:]) != content_key(a[:4], a[4:])
