"""NetCDF round-trip tests (reference /root/reference/tests/test_netcdf.cpp)
plus codec-level checks of the in-tree CDF container implementation."""

import numpy as np
import pytest

from spsparse_tpu import CooBuilder, SpSparseError
from spsparse_tpu.io import (
    NcAttr, NcFile, NcIO, load_netcdf, ncio_spsparse, read_cdf, save_netcdf,
    write_cdf,
)


def example_array():
    # test_netcdf.cpp: 3-entry 5x6 array
    b = CooBuilder((5, 6))
    b.add((1, 2), 3.5)
    b.add((2, 3), 4.5)
    b.add((4, 5), 5.5)
    return b.build()


class TestCdfCodec:
    @pytest.mark.parametrize("version", [1, 2, 5])
    def test_round_trip_basic(self, tmp_path, version):
        nc = NcFile(version=version)
        d0 = nc.add_dim("x", 3)
        d1 = nc.add_dim("y", 2)
        nc.add_var("m", [d0, d1], np.arange(6, dtype=np.float64).reshape(3, 2))
        v = nc.add_var("iv", [d0], np.array([1, -2, 3], np.int32))
        v.attrs.append(NcAttr("units", b"meters"))
        nc.gattrs.append(NcAttr("title", b"test"))
        path = tmp_path / f"t{version}.nc"
        write_cdf(path, nc)
        back = read_cdf(path)
        assert back.version == version
        np.testing.assert_allclose(back.var("m").data,
                                   np.arange(6).reshape(3, 2))
        np.testing.assert_array_equal(back.var("iv").data, [1, -2, 3])
        assert back.var("iv").attrs[0].values == b"meters"
        assert back.gattrs[0].values == b"test"

    def test_int64_requires_cdf5(self, tmp_path):
        nc = NcFile(version=2)
        d = nc.add_dim("n", 2)
        nc.add_var("big", [d], np.array([1, 2], np.int64))
        with pytest.raises(ValueError):
            write_cdf(tmp_path / "bad.nc", nc)

    def test_scalar_var_and_padding(self, tmp_path):
        nc = NcFile(version=5)
        nc.add_var("s", [], np.asarray(7, np.int64))
        d = nc.add_dim("odd", 3)
        nc.add_var("b", [d], np.array([1, 2, 3], np.int8))  # needs padding
        path = tmp_path / "pad.nc"
        write_cdf(path, nc)
        back = read_cdf(path)
        assert int(back.var("s").data) == 7
        np.testing.assert_array_equal(back.var("b").data, [1, 2, 3])


class TestScipyCrossValidation:
    """Independent validation of the classic-CDF container bytes: scipy's
    ``scipy.io.netcdf_file`` is a third-party CDF-1/2 codec (the same wire
    format libnetcdf writes for the reference's classic files,
    /root/reference/slib/spsparse/netcdf.hpp:23-76). Both directions —
    our writer -> scipy reader, scipy writer -> our reader — so the interop
    claim no longer rests on the codec reading its own writes. CDF-5 is
    excluded (scipy does not implement it); its schema-level checks live in
    TestSpSparseSchema/TestCdfCodec."""

    @pytest.mark.parametrize("version", [1, 2])
    def test_ours_readable_by_scipy(self, tmp_path, version):
        from scipy.io import netcdf_file
        nc = NcFile(version=version)
        d0 = nc.add_dim("n", 4)
        d1 = nc.add_dim("r", 2)
        nc.add_var("idx", [d0, d1],
                   np.array([[0, 1], [1, 3], [2, 0], [3, 5]], np.int32))
        v = nc.add_var("vals", [d0], np.array([1.5, -2.5, 3.5, 0.25]))
        v.attrs.append(NcAttr("units", b"kg"))
        nc.add_var("small", [d1], np.array([7, -8], np.int16))
        nc.gattrs.append(NcAttr("title", b"interop"))
        path = str(tmp_path / f"ours{version}.nc")
        write_cdf(path, nc)

        with netcdf_file(path, "r", mmap=False) as f:
            assert f.dimensions["n"] == 4
            assert f.dimensions["r"] == 2
            np.testing.assert_array_equal(
                f.variables["idx"][:], [[0, 1], [1, 3], [2, 0], [3, 5]])
            np.testing.assert_allclose(f.variables["vals"][:],
                                       [1.5, -2.5, 3.5, 0.25])
            assert f.variables["vals"].units == b"kg"
            np.testing.assert_array_equal(f.variables["small"][:], [7, -8])
            assert f.title == b"interop"

    @pytest.mark.parametrize("version", [1, 2])
    def test_scipy_readable_by_ours(self, tmp_path, version):
        from scipy.io import netcdf_file
        path = str(tmp_path / f"scipy{version}.nc")
        with netcdf_file(path, "w", version=version) as f:
            f.createDimension("n", 3)
            f.createDimension("r", 2)
            vi = f.createVariable("idx", np.int32, ("n", "r"))
            vi[:] = np.array([[4, 5], [0, 1], [2, 2]], np.int32)
            vv = f.createVariable("vals", np.float64, ("n",))
            vv[:] = np.array([9.0, -1.0, 0.5])
            vv.units = "m"
            f.history = "made by scipy"

        back = read_cdf(path)
        assert back.version == version
        assert back.dim("n").size == 3
        np.testing.assert_array_equal(back.var("idx").data,
                                      [[4, 5], [0, 1], [2, 2]])
        np.testing.assert_allclose(back.var("vals").data, [9.0, -1.0, 0.5])
        units = [a for a in back.var("vals").attrs if a.name == "units"][0]
        assert bytes(units.values) == b"m"
        hist = [a for a in back.gattrs if a.name == "history"][0]
        assert bytes(hist.values) == b"made by scipy"

    def test_scipy_written_schema_loads(self, tmp_path):
        """A foreign (scipy-written) CDF-2 file in the spsparse schema with
        int32 indices — the classic-file variant a pre-CDF5 toolchain
        produces — loads through ``load_netcdf``."""
        from scipy.io import netcdf_file
        path = str(tmp_path / "schema32.nc")
        with netcdf_file(path, "w", version=2) as f:
            f.createDimension("A.size", 3)
            f.createDimension("A.rank", 2)
            vi = f.createVariable("A.indices", np.int32, ("A.size", "A.rank"))
            vi[:] = np.array([[1, 2], [2, 3], [4, 5]], np.int32)
            vv = f.createVariable("A.vals", np.float64, ("A.size",))
            vv[:] = np.array([3.5, 4.5, 5.5])
            info = f.createVariable("A.info", np.int32, ())
            info.data = np.zeros((), np.int32)
            # scipy reserves .shape on the variable object; set the netCDF
            # attribute through the attribute dict instead.
            info._attributes["shape"] = np.array([5, 6], np.int32)
        B = load_netcdf(path, "A", rank=2)
        assert B.shape == (5, 6)
        idx, vals = B.to_lists()
        assert idx == [(1, 2), (2, 3), (4, 5)]
        np.testing.assert_allclose(vals, [3.5, 4.5, 5.5])


class TestSpSparseSchema:
    def test_round_trip_alloc(self, tmp_path):
        # test_netcdf.cpp:49-98 — write, read back with alloc
        A = example_array()
        path = tmp_path / "sp.nc"
        save_netcdf(path, {"A": A})
        B = load_netcdf(path, "A", rank=2)
        assert B.shape == (5, 6)
        assert B.to_lists() == A.to_lists()

    def test_round_trip_prealloc_shape(self, tmp_path):
        A = example_array()
        path = tmp_path / "sp.nc"
        save_netcdf(path, {"A": A})
        B = load_netcdf(path, "A", rank=2, alloc=False, shape=(5, 6))
        assert B.to_lists() == A.to_lists()

    def test_rank_mismatch_raises(self, tmp_path):
        A = example_array()
        path = tmp_path / "sp.nc"
        save_netcdf(path, {"A": A})
        with pytest.raises(SpSparseError):
            load_netcdf(path, "A", rank=1)

    def test_schema_layout(self, tmp_path):
        # Pin the exact reference schema (netcdf.hpp:93-106).
        A = example_array()
        path = tmp_path / "sp.nc"
        save_netcdf(path, {"A": A})
        nc = read_cdf(path)
        assert nc.dim("A.size").size == 3
        assert nc.dim("A.rank").size == 2
        iv = nc.var("A.indices")
        assert iv.nc_type == 10  # NC_INT64
        assert iv.data.shape == (3, 2)
        vv = nc.var("A.vals")
        assert vv.nc_type == 6   # NC_DOUBLE
        info = nc.var("A.info")
        shape_attr = [a for a in info.attrs if a.name == "shape"][0]
        assert shape_attr.values.dtype == np.uint64
        np.testing.assert_array_equal(shape_attr.values, [5, 6])

    def test_ncio_deferred_sessions(self, tmp_path):
        A = example_array()
        path = tmp_path / "sp.nc"
        with NcIO(path, "w") as ncio:
            ncio_spsparse(ncio, A, False, "A")
        ncio = NcIO(path, "r")
        ncio_spsparse(ncio, None, True, "A", rank=2)
        results = ncio.flush()
        assert results["A"].to_lists() == A.to_lists()

    def test_multiple_arrays(self, tmp_path):
        A = example_array()
        b = CooBuilder((4,))
        b.add((1,), 2.0)
        V = b.build()
        path = tmp_path / "multi.nc"
        save_netcdf(path, {"A": A, "V": V})
        assert load_netcdf(path, "A").to_lists() == A.to_lists()
        assert load_netcdf(path, "V").to_lists() == V.to_lists()


class TestShardedCheckpoints:
    def _banded(self, n, band, rng):
        b = CooBuilder((n, n), dtype=np.float64)
        rows, cols, vals = [], [], []
        for off in range(-band, band + 1):
            r = np.arange(max(0, -off), min(n, n - off))
            rows.append(r)
            cols.append(r + off)
            vals.append(rng.uniform(-1, 1, r.shape[0]))
        b.add_many(np.stack([np.concatenate(rows), np.concatenate(cols)], 1),
                   np.concatenate(vals))
        return b.build()

    def test_round_trip(self, tmp_path, rng):
        from spsparse_tpu.dist import partition_rows
        from spsparse_tpu.io.sharded import (load_netcdf_sharded,
                                             save_netcdf_sharded)
        A = self._banded(37, 2, rng)
        part = partition_rows(A, 4)
        prefix = str(tmp_path / "ckpt")
        save_netcdf_sharded(prefix, part, "A")
        back = load_netcdf_sharded(prefix)
        np.testing.assert_allclose(back.to_dense(), part.to_dense(),
                                   rtol=1e-12)
        # each shard is independently readable with the plain loader
        blk = load_netcdf(prefix + ".part00001.nc", "A", rank=2)
        assert blk.shape == (10, 37)

    def test_partial_host_write(self, tmp_path, rng):
        from spsparse_tpu.dist import partition_rows
        from spsparse_tpu.io.sharded import (load_netcdf_sharded,
                                             save_netcdf_sharded)
        A = self._banded(16, 1, rng)
        part = partition_rows(A, 4)
        prefix = str(tmp_path / "ck2")
        # two "hosts" each write their partitions
        save_netcdf_sharded(prefix, part, "A", parts=[0, 1])
        save_netcdf_sharded(prefix, part, "A", parts=[2, 3])
        back = load_netcdf_sharded(prefix)
        np.testing.assert_allclose(back.to_dense(), part.to_dense(),
                                   rtol=1e-12)


class TestNc4Container:
    def test_round_trip_hdf5(self, tmp_path):
        from spsparse_tpu.io import is_hdf5
        A = example_array()
        path = str(tmp_path / "sp4.nc")
        save_netcdf(path, {"A": A}, version=4)
        assert is_hdf5(path)
        B = load_netcdf(path, "A", rank=2)
        assert B.shape == (5, 6)
        assert B.to_lists() == A.to_lists()

    def test_h5py_written_file_readable(self, tmp_path):
        # Simulate a file produced by another HDF5/netCDF-4 writer.
        import h5py
        import numpy as np
        path = str(tmp_path / "foreign.nc")
        with h5py.File(path, "w") as f:
            for dname, size in (("A.size", 2), ("A.rank", 2)):
                ds = f.create_dataset(dname, shape=(size,), dtype=np.float32)
                ds.attrs["CLASS"] = np.bytes_(b"DIMENSION_SCALE")
                ds.attrs["NAME"] = np.bytes_(
                    b"This is a netCDF dimension but not a netCDF variable.")
                ds.make_scale(dname)
            iv = f.create_dataset("A.indices",
                                  data=np.array([[0, 1], [3, 4]], np.int64))
            iv.dims[0].attach_scale(f["A.size"])
            iv.dims[1].attach_scale(f["A.rank"])
            vv = f.create_dataset("A.vals", data=np.array([7.5, 8.5]))
            vv.dims[0].attach_scale(f["A.size"])
            info = f.create_dataset("A.info", data=np.int64(0))
            info.attrs["shape"] = np.array([5, 6], np.uint64)
        B = load_netcdf(path, "A", rank=2)
        assert B.shape == (5, 6)
        idx, vals = B.to_lists()
        assert idx == [(0, 1), (3, 4)]
        np.testing.assert_allclose(vals, [7.5, 8.5])

    def test_ncio_reads_either_container(self, tmp_path):
        A = example_array()
        p4 = str(tmp_path / "v4.nc")
        p5 = str(tmp_path / "v5.nc")
        save_netcdf(p4, {"A": A}, version=4)
        save_netcdf(p5, {"A": A}, version=5)
        for p in (p4, p5):
            ncio = NcIO(p, "r")
            ncio_spsparse(ncio, None, True, "A", rank=2)
            assert ncio.flush()["A"].to_lists() == A.to_lists()


class TestEmptyArraysAndCodecEdges:
    def test_empty_array_classic_round_trip_and_scipy(self, tmp_path):
        # nnz = 0 -> the size dim is the classic-format RECORD dimension;
        # the codec must emit a valid 0-record file (it used to write an
        # invalid fixed dim of size 0 that scipy crashed on).
        from spsparse_tpu import CooBuilder
        from spsparse_tpu.io import load_netcdf, save_netcdf
        E = CooBuilder((5, 6), dtype=np.float64).build()
        p = str(tmp_path / "empty.nc")
        save_netcdf(p, {"A": E}, version=5)
        A2 = load_netcdf(p, "A")
        assert int(A2.nnz) == 0 and A2.shape == (5, 6)
        # scipy reads CDF-1/2 only; check the 0-record encoding there.
        from spsparse_tpu.io.cdf import NcFile, write_cdf
        from scipy.io import netcdf_file
        nc = NcFile(version=2)
        d0 = nc.add_dim("n", 0)
        dr = nc.add_dim("r", 2)
        v = nc.add_var("idx", [d0, dr], np.zeros((0, 2), np.int32))
        v.nc_type = 4
        nc.add_var("fix", [dr], np.asarray([7.0, 8.0]))
        p2 = str(tmp_path / "rec0.nc")
        write_cdf(p2, nc)
        with netcdf_file(p2, "r") as nf:
            assert nf.variables["idx"].shape[0] == 0
            np.testing.assert_array_equal(nf.variables["fix"][:],
                                          [7.0, 8.0])

    def test_two_empty_arrays_classic_refused_nc4_ok(self, tmp_path):
        from spsparse_tpu import CooBuilder
        from spsparse_tpu.io import load_netcdf, save_netcdf
        E = CooBuilder((3, 3), dtype=np.float64).build()
        with pytest.raises(ValueError, match="record"):
            save_netcdf(str(tmp_path / "x.nc"), {"A": E, "B": E}, version=5)
        p4 = str(tmp_path / "x4.nc")
        save_netcdf(p4, {"A": E, "B": E}, version=4)
        assert int(load_netcdf(p4, "B").nnz) == 0

    def test_nc4_stub_dims_not_phantom_vars(self, tmp_path):
        # make_scale used to clobber the NAME stub marker, surfacing
        # A.size/A.rank as phantom float32 variables on read.
        from spsparse_tpu import CooBuilder
        from spsparse_tpu.io import save_netcdf
        from spsparse_tpu.io.nc4 import read_nc4
        b = CooBuilder((4, 4), dtype=np.float64)
        b.add((1, 2), 3.0)
        p = str(tmp_path / "m4.nc")
        save_netcdf(p, {"A": b.build()}, version=4)
        names = {v.name for v in read_nc4(p).vars}
        assert "A.size" not in names and "A.rank" not in names
        assert {"A.info", "A.indices", "A.vals"} <= names

    def test_utf8_attr_and_truncated_magic(self, tmp_path):
        from spsparse_tpu.io.cdf import (NcAttr, NcDim, NcFile, NcVar,
                                         read_cdf, write_cdf)
        nc = NcFile(version=2)
        nc.dims.append(NcDim("n", 3))
        nc.gattrs.append(NcAttr("units", "µµµ"))   # 3 chars, 6 bytes
        nc.vars.append(NcVar("x", [0], 6, [], np.arange(3.0)))
        p = str(tmp_path / "u.nc")
        write_cdf(p, nc)
        rt = read_cdf(p)
        np.testing.assert_array_equal(np.asarray(rt.vars[0].data),
                                      np.arange(3.0))
        pt = str(tmp_path / "t.nc")
        open(pt, "wb").write(b"CDF")
        with pytest.raises(ValueError):
            read_cdf(pt)

    def test_native_dim_beginnings_empty(self):
        from spsparse_tpu import native
        b, r = native.dim_beginnings_host(np.array([], np.int64))
        np.testing.assert_array_equal(b, [0])
        assert r.size == 0
