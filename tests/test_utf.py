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


def test_storage_flag_0x70_constant2():
    """0x70 ("CONSTANT2", old CPKs) parses like 0x30; the reference raises."""
    from struct import calcsize

    blob = bytearray(UTFBuilder(_payload_multi(UTFTypeValues),
                                table_name="C2").parse())
    base = UTF(bytes(blob))
    # walk the column records and flip every 0x30 storage flag to 0x70
    from pycricodecs_tpu.containers.chunk import UTFChunkHeader
    num_columns = int.from_bytes(blob[24:26], "big")
    pos = UTFChunkHeader.size
    flipped = 0
    for _ in range(num_columns):
        flag = blob[pos]
        storage, tindex = flag >> 4, flag & 0xF
        if storage == 0x3:
            blob[pos] = 0x70 | tindex
            flipped += 1
        pos += 5
        if storage == 0x3:
            pos += calcsize(">" + ("II" if tindex == 0xB
                                   else "BbHhIiQqfdI"[tindex]))
    assert flipped, "fixture must contain a constant column"
    got = UTF(bytes(blob))
    assert got.table == base.table
    assert _norm(got.get_payload()) == _norm(base.get_payload())


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
