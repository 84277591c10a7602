"""CLI contract tests (main_prover.cpp:23-103 parity)."""

import json
import os

from rapidsnark_tpu import cli
from rapidsnark_tpu.io.zkey import read_zkey, zkey_to_ref
from rapidsnark_tpu.ref.groth16 import Proof, verify

from conftest import FIXTURES


def test_cli_usage_error(capsys):
    assert cli.main([]) == 255
    assert "Usage: prover" in capsys.readouterr().err


def test_cli_prove_writes_verifiable_artifacts(tmp_path, monkeypatch):
    # share the window size (and so the compiled executable) with the
    # other device tests
    monkeypatch.setenv("RSTPU_WINDOW_BITS", "4")
    proof_path = str(tmp_path / "proof.json")
    public_path = str(tmp_path / "public.json")
    rc = cli.main([os.path.join(FIXTURES, "multiplier.zkey"),
                   os.path.join(FIXTURES, "multiplier.wtns"),
                   proof_path, public_path])
    assert rc == 0

    with open(proof_path) as f:
        pj = json.load(f)
    with open(public_path) as f:
        pub = json.load(f)

    # snarkjs-compatible shapes (groth16.cpp:268-301, main_prover.cpp:85-93)
    assert pj["protocol"] == "groth16"
    assert pj["pi_a"][2] == "1" and pj["pi_b"][2] == ["1", "0"]
    assert all(isinstance(v, str) for v in pub)

    ref_zk = zkey_to_ref(read_zkey(os.path.join(FIXTURES,
                                                "multiplier.zkey")))
    p = Proof(a=(int(pj["pi_a"][0]), int(pj["pi_a"][1])),
              b=((int(pj["pi_b"][0][0]), int(pj["pi_b"][0][1])),
                 (int(pj["pi_b"][1][0]), int(pj["pi_b"][1][1]))),
              c=(int(pj["pi_c"][0]), int(pj["pi_c"][1])))
    assert verify(ref_zk, p, [int(v) for v in pub])


def test_cli_wrong_wtns_curve(tmp_path, capsys):
    """main_prover.cpp:54 'different wtns curve'."""
    from rapidsnark_tpu.io.wtns import write_wtns
    bad = str(tmp_path / "bad.wtns")
    write_wtns(bad, [1, 2, 3], prime=2 ** 255 - 19)
    rc = cli.main([os.path.join(FIXTURES, "multiplier.zkey"), bad,
                   str(tmp_path / "p.json"), str(tmp_path / "pub.json")])
    assert rc == 255
    assert "different wtns curve" in capsys.readouterr().err


def test_export_vkey_matches_golden_model(tmp_path):
    """tools/export_vkey.py emits the snarkjs verification_key.json
    shape with exactly the vk/IC points the golden model parses from
    the same zkey (the snarkjs cross-check recipe in README.md)."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "export_vkey", os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "export_vkey.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    path = os.path.join(FIXTURES, "sqchain64.zkey")
    vk = mod.vkey_dict(path)
    ref_zk = zkey_to_ref(read_zkey(path))

    assert vk["protocol"] == "groth16" and vk["curve"] == "bn128"
    assert vk["nPublic"] == ref_zk.n_public
    ax, ay = ref_zk.vk_alpha1
    assert vk["vk_alpha_1"] == [str(ax), str(ay), "1"]
    (bx0, bx1), (by0, by1) = ref_zk.vk_beta2
    assert vk["vk_beta_2"] == [[str(bx0), str(bx1)],
                               [str(by0), str(by1)], ["1", "0"]]
    assert len(vk["IC"]) == ref_zk.n_public + 1
    for got, want in zip(vk["IC"], ref_zk.ic):
        assert got == [str(want[0]), str(want[1]), "1"]
    # serializable (what the file write produces)
    json.dumps(vk)
