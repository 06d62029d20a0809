"""Tests for the benchmark-comparison adapter layer (tmar/eval/adapters.py):
sample enrichment, the four preprocessing protocols, the out-of-process
subprocess adapter, and the harness integration incl. composite figures."""

import os
import sys

import numpy as np
import pytest

from tmar.eval.adapters import (
    SubprocessAdapter,
    enrich_sample,
    make_neg11_runner,
    make_nmar_runner,
    make_sparse_view_runner,
    make_x255_runner,
)
from tmar.eval.harness import ModelEntry, run_comparison


@pytest.fixture(scope="module")
def radon32():
    from tmar.ops import Radon

    return Radon(32, np.linspace(0, np.pi, 16, endpoint=False))


@pytest.fixture()
def sample():
    rng = np.random.default_rng(0)
    gt = rng.uniform(-1, 0.0, (32, 32)).astype(np.float32)
    ct = gt.copy()
    ct[12:16, 12:16] = 0.95  # metal blob above the 0.6 threshold
    return {"ct": ct, "gt": gt, "li": gt}


def test_enrich_without_radon(sample):
    e = enrich_sample(sample)
    assert set(e) >= {"Xma", "Xgt", "XLI", "Mask", "Sma", "SLI", "Tr"}
    assert e["Xma"].min() >= 0 and e["Xma"].max() <= 1
    assert e["Mask"].dtype == np.float32 and set(np.unique(e["Mask"])) <= {0.0, 1.0}
    assert e["Mask"][13, 13] == 1.0 and e["Mask"][0, 0] == 0.0
    assert e["Sma"] is None and not e["has_sinogram"]


def test_enrich_with_radon(sample, radon32):
    e = enrich_sample(sample, radon=radon32)
    assert e["has_sinogram"]
    assert e["Sma"].shape == (16, 32)  # [angles, det]
    assert e["Tr"].shape == e["Sma"].shape
    assert set(np.unique(e["Tr"])) <= {0.0, 1.0}
    # the metal trace covers the metal's projections at every angle
    assert e["Tr"].sum(axis=1).min() > 0


def test_neg11_runner_identity(sample):
    run = make_neg11_runner(lambda x: x)
    e = enrich_sample(sample)
    np.testing.assert_allclose(run(e), e["Xma"], atol=1e-6)


def test_x255_runner_protocols(sample):
    e = enrich_sample(sample)
    seen = {}

    def core(xma255, xli255, non_mask):
        seen["max"] = xma255.max()
        seen["non_mask_at_metal"] = non_mask[13, 13]
        return xli255

    run = make_x255_runner(core, postprocess="div255")
    out = run(e)
    assert 1.0 < seen["max"] <= 255.0     # inputs really were x255
    assert seen["non_mask_at_metal"] == 0.0  # non_mask = 1 - metal
    np.testing.assert_allclose(out, e["XLI"], atol=1e-6)

    # 'half' postprocess: clamp(out/255, 0, .5)/.5
    run_h = make_x255_runner(lambda a, b, c: a, postprocess="half")
    np.testing.assert_allclose(
        run_h(e), np.clip(e["Xma"], 0, 0.5) / 0.5, atol=1e-6
    )


def test_nmar_runner(sample, radon32):
    e = enrich_sample(sample, radon=radon32)
    captured = {}

    def core(xma, xli, sma, sli, tr, xprior):
        captured["prior"] = xprior
        captured["tr"] = tr
        return xma

    run = make_nmar_runner(core)
    out = run(e)
    assert out.shape == (32, 32)
    # prior is x255-scaled and tissue-flattened: mostly air/water values
    prior01 = captured["prior"] / 255.0
    frac_flat = np.mean(
        (np.abs(prior01) < 1e-3) | (np.abs(prior01 - 0.192) < 1e-3)
    )
    assert frac_flat > 0.9
    # trace handed to the model is INVERTED (1 = outside metal trace)
    assert set(np.unique(captured["tr"])) <= {0.0, 1.0}
    np.testing.assert_allclose(captured["tr"], 1 - e["Tr"], atol=0)


def test_nmar_runner_requires_sinograms(sample):
    run = make_nmar_runner(lambda *a: a[0])
    with pytest.raises(ValueError, match="sinogram"):
        run(enrich_sample(sample))


def test_sparse_view_runner(sample, radon32):
    e = enrich_sample(sample, radon=radon32)
    captured = {}

    def core(xma, xli, mask, sma, sli, tr_dc):
        captured["sma"] = sma
        captured["tr_dc"] = tr_dc
        return xma

    run = make_sparse_view_runner(core, radon32, factor=2)
    out = run(e)
    assert out.shape == (32, 32)
    # dropped angles are zero in the sparse sinogram
    assert np.abs(captured["sma"][1::2]).max() == 0.0
    # and excluded from the data-consistency trace
    assert captured["tr_dc"][1::2].max() == 0.0
    # kept angles outside the metal trace remain data-consistent
    kept_outside = (1 - e["Tr"][0::2]) * captured["tr_dc"][0::2]
    assert kept_outside.max() == 1.0


ADAPTER_SCRIPT = """\
import sys
import numpy as np
d = np.load(sys.argv[1])
np.save(sys.argv[2], np.clip(d["Xma"] * 0.9, 0, 1))
"""


def test_subprocess_adapter_round_trip(tmp_path, sample):
    script = tmp_path / "adapter.py"
    script.write_text(ADAPTER_SCRIPT)
    ad = SubprocessAdapter([sys.executable, str(script)])
    e = enrich_sample(sample)
    out = ad(e)
    np.testing.assert_allclose(out, np.clip(e["Xma"] * 0.9, 0, 1), atol=1e-6)


def test_li_baseline_adapter_tool(sample):
    """tools/adapter_li.py (the committed LI-baseline comparison entry)
    speaks the SubprocessAdapter protocol and returns the sample's XLI."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ad = SubprocessAdapter([sys.executable, os.path.join(repo, "tools", "adapter_li.py")])
    e = enrich_sample(sample)
    out = ad(e)
    np.testing.assert_allclose(out, np.clip(e["XLI"], 0, 1), atol=1e-6)


def test_subprocess_adapter_failure_raises(tmp_path, sample):
    script = tmp_path / "bad.py"
    script.write_text("import sys; sys.exit(3)")
    ad = SubprocessAdapter([sys.executable, str(script)])
    with pytest.raises(RuntimeError, match="rc=3"):
        ad(enrich_sample(sample))


class _TinyDataset:
    def __init__(self, n=6, size=32):
        self.samples = []
        rng = np.random.default_rng(1)
        for _ in range(n):
            gt = rng.uniform(-1, 0, (size, size)).astype(np.float32)
            ct = gt.copy()
            ct[10:14, 10:14] = 0.9
            self.samples.append({"ct": ct, "gt": gt, "li": gt})

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        return self.samples[i]


def test_run_comparison_mixed_entries(tmp_path):
    """Forward-interface + runner-interface + a FAILING adapter in one sweep:
    combined CSV has >= 3 rows, composites written, failure isolated."""
    script = tmp_path / "adapter.py"
    script.write_text(ADAPTER_SCRIPT)
    bad = tmp_path / "bad.py"
    bad.write_text("import sys; sys.exit(1)")

    entries = [
        ModelEntry("identity", forward=lambda x: x),
        ModelEntry("sub09", runner=SubprocessAdapter([sys.executable, str(script)])),
        ModelEntry("broken", runner=SubprocessAdapter([sys.executable, str(bad)])),
    ]
    out = tmp_path / "cmp"
    results = run_comparison(
        entries, _TinyDataset(), str(out), num_samples=4, composite_samples=2
    )
    assert results["identity"]["status"] == "ok"
    assert results["sub09"]["status"] == "ok"
    assert results["broken"]["status"] == "FAILED"
    # combined artifacts
    csv_text = (out / "summary.csv").read_text()
    assert csv_text.count("\n") >= 4  # header + 3 models
    assert "FAILED" in csv_text
    assert (out / "identity" / "per_sample.csv").exists()
    figs = sorted(os.listdir(out / "figures"))
    assert any(f.startswith("composite_sample_") for f in figs)
    assert any(f.startswith("profiles_sample_") for f in figs)


CORE_SCRIPT = """import sys
import numpy as np
d = np.load(sys.argv[1])
assert set(d.files) >= {"Xma255", "XLI255", "non_mask"}, d.files
np.save(sys.argv[2], d["Xma255"] * 0.5)
"""


def test_subprocess_core_x255_protocol(tmp_path, sample):
    """make_protocol_subprocess_runner('x255'): the in-repo x255 protocol
    wraps an out-of-process core — the core sees the ×255 arrays under
    their documented npz keys and its ×255 output rides the div255 post."""
    from tmar.eval.adapters import make_protocol_subprocess_runner

    script = tmp_path / "core.py"
    script.write_text(CORE_SCRIPT)
    run = make_protocol_subprocess_runner("x255", [sys.executable, str(script)])
    e = enrich_sample(sample)
    out = run(e)
    np.testing.assert_allclose(
        out, np.clip(np.clip(e["Xma"], 0, 1) * 0.5, 0, 1), atol=1e-6
    )


def test_subprocess_core_sparse_protocol(tmp_path, sample, radon32):
    """sparse protocol out-of-process: the core receives the sparse-view
    ×255 FBP arrays + TrDC and returns out255 (here: the input), post
    processed with the clamp-to-0.5 MEPNet rule."""
    from tmar.eval.adapters import make_protocol_subprocess_runner

    script = tmp_path / "core.py"
    script.write_text(
        "import sys\nimport numpy as np\n"
        "d = np.load(sys.argv[1])\n"
        "assert set(d.files) >= {'Xma255','XLI255','Mask','Sma255','SLI255','TrDC'}\n"
        "np.save(sys.argv[2], d['Xma255'])\n"
    )
    run = make_protocol_subprocess_runner(
        "sparse", [sys.executable, str(script)], radon=radon32
    )
    out = run(enrich_sample(sample, radon=radon32))
    assert out.shape == sample["ct"].shape and np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_subprocess_core_unknown_protocol():
    from tmar.eval.adapters import make_protocol_subprocess_runner

    with pytest.raises(ValueError, match="unknown adapter protocol"):
        make_protocol_subprocess_runner("bogus", ["true"])


def test_subprocess_core_sparse_needs_radon():
    from tmar.eval.adapters import make_protocol_subprocess_runner

    with pytest.raises(ValueError, match="radon"):
        make_protocol_subprocess_runner("sparse", ["true"], radon=None)
