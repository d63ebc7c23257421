"""@UTF table parity tests vs the reference Python implementation."""
import pytest

from pycricodecs_tpu.containers.chunk import UTFTypeValues
from pycricodecs_tpu.containers.utf import UTF, UTFBuilder


def _payload_multi(tv):
    return [
        {
            "FileName": (tv.string, f"file_{i}.bin"),
            "FileSize": (tv.uint, 0x800 * (i + 1)),
            "ExtractSize": (tv.uint, 0x1000 * (i + 1)),
            "Blob": (tv.bytes, bytes([i]) * 8),
            "ID": (tv.uint, i),
            "Const": (tv.ushort, 7),
            "Empty": (tv.uint, None),
            "NullStr": (tv.string, "<NULL>"),
        }
        for i in range(5)
    ]


def _payload_single(tv):
    return [{
        "Name": (tv.string, "single"),
        "Value": (tv.ullong, 123456789),
        "Flag": (tv.ushort, None),
        "Data": (tv.bytes, b"\x01\x02\x03\x04"),
    }]


def _ref_tv(oracle_py):
    return oracle_py.chunk.UTFTypeValues


@pytest.mark.parametrize("payload_fn", [_payload_multi, _payload_single])
@pytest.mark.parametrize("encrypt", [False, True])
def test_builder_matches_reference(oracle_py, payload_fn, encrypt):
    ours = bytes(UTFBuilder(payload_fn(UTFTypeValues), encrypt=encrypt,
                            table_name="TestTable").parse())
    ref = bytes(oracle_py.UTFBuilder(payload_fn(_ref_tv(oracle_py)),
                                     encrypt=encrypt,
                                     table_name="TestTable").parse())
    assert ours == ref


def _norm(payload):
    """Normalise a payload to enum-value-keyed tuples for cross-package diff."""
    return [{k: (v[0].value, bytes(v[1]) if isinstance(v[1], (bytes, bytearray))
                 else v[1]) for k, v in row.items()} for row in payload]


@pytest.mark.parametrize("encrypt", [False, True])
def test_parse_roundtrip(oracle_py, encrypt):
    blob = bytes(UTFBuilder(_payload_multi(UTFTypeValues), encrypt=encrypt,
                            table_name="RT").parse())
    ours = UTF(blob)
    ref = oracle_py.UTF(blob)
    assert ours.table == ref.table
    assert _norm(ours.get_payload()) == _norm(ref.get_payload())
    assert ours.table_name == ref.table_name == "RT"


def test_parse_reference_built(oracle_py):
    blob = bytes(oracle_py.UTFBuilder(_payload_single(_ref_tv(oracle_py)),
                                      table_name="OneRow").parse())
    assert _norm(UTF(blob).get_payload()) == _norm(oracle_py.UTF(blob).get_payload())


def test_shiftjis_strings(oracle_py):
    def mk(tv):
        return [{"Name": (tv.string, "日本語"), "N": (tv.uint, 1)}]
    ours = bytes(UTFBuilder(mk(UTFTypeValues), encoding="shift-jis",
                            table_name="SJ").parse())
    ref = bytes(oracle_py.UTFBuilder(mk(_ref_tv(oracle_py)),
                                     encoding="shift-jis",
                                     table_name="SJ").parse())
    assert ours == ref
    assert _norm(UTF(ours).get_payload()) == _norm(oracle_py.UTF(ours).get_payload())
