"""CLI tools tests (in-process invocation of the argparse main)."""

import json

import numpy as np

from spsparse_tpu import CooBuilder
from spsparse_tpu.io import save_netcdf
from spsparse_tpu.tools.__main__ import main


def _mk(tmp_path):
    b = CooBuilder((10, 12), dtype=np.float64)
    b.add((1, 3), 2.0)
    b.add((4, 4), 5.0)
    p = str(tmp_path / "m.nc")
    save_netcdf(p, {"M": b.build()})
    return p


def test_info(tmp_path, capsys):
    p = _mk(tmp_path)
    assert main(["info", p]) == 0
    out = capsys.readouterr().out
    assert "classic CDF-5" in out and "spsparse arrays: M" in out


def test_convert_and_stats(tmp_path, capsys):
    p = _mk(tmp_path)
    q = str(tmp_path / "m4.nc")
    assert main(["convert", p, q, "--version", "4"]) == 0
    capsys.readouterr()
    assert main(["stats", q, "M"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["nnz"] == 2 and stats["shape"] == [10, 12]
    assert stats["bandwidth"] == 2


def test_convert_no_arrays(tmp_path, capsys):
    from spsparse_tpu.io import NcFile, write_cdf
    p = str(tmp_path / "empty.nc")
    write_cdf(p, NcFile(version=5))
    assert main(["convert", p, str(tmp_path / "o.nc")]) == 1
