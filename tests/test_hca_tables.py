"""Direct bit-for-bit verification of the HCA constant tables.

Every generated table (closed-form float64 -> one fp32 round) and every
embedded table in ops/_hca_data.py is compared against the literal arrays in
the reference source (/root/reference/CriCodecs/hca.cpp) parsed at test time.
Decode/encode byte-parity tests exercise these indirectly; this locks the
table *generation* itself, independent of the codec paths.

The float tables in the reference are stored as hex bit patterns
(e.g. hcadequantizer_scaling_table_float_hex) — comparison is on the u32
bit patterns, not approximate float equality.
"""
import os
import re

import numpy as np
import pytest

from pycricodecs_tpu.ops import hca_tables as T
from pycricodecs_tpu.utils.crc import CRC16_TABLE

REF_HCA = "/root/reference/CriCodecs/hca.cpp"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_HCA), reason="reference source not mounted")

_NUM = re.compile(r"[-+]?(?:0[xX][0-9a-fA-F]+|\d+\.?\d*(?:[eE][-+]?\d+)?)")


def _parse_num(tok: str):
    if tok.lstrip("+-").lower().startswith("0x"):
        sign = -1 if tok.startswith("-") else 1
        return sign * int(tok.lstrip("+-"), 16)
    tok = tok.rstrip("fF")  # C float suffix (hex handled above)
    if "." in tok or "e" in tok.lower():
        return float(tok)
    return int(tok)


def _ref_table(name: str, src_path: str = REF_HCA):
    """Parse the C array literal `name` out of the reference source."""
    src = open(src_path, encoding="utf-8", errors="replace").read()
    m = re.search(re.escape(name) + r"\s*(?:\[\w*\])+\s*=\s*\{", src)
    assert m, f"table {name} not found in {src_path}"
    i = m.end() - 1
    depth = 0
    for j in range(i, len(src)):
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
            if depth == 0:
                break
    body = src[i + 1:j]
    body = re.sub(r"/\*.*?\*/", " ", body, flags=re.S)
    body = re.sub(r"//[^\n]*", " ", body)
    body = body.replace("{", " ").replace("}", " ")
    return [_parse_num(t) for t in _NUM.findall(body)]


def _u32(vals):
    return np.asarray(vals, dtype=np.int64).astype(np.uint32)


def _bits(f32_arr):
    return np.asarray(f32_arr, dtype=np.float32).reshape(-1).view(np.uint32)


# --- generated float tables: closed form must hit the exact bit patterns ----

def test_scaling_table_bits():
    ref = _u32(_ref_table("hcadequantizer_scaling_table_float_hex"))
    assert ref.shape == (64,)
    np.testing.assert_array_equal(_bits(T.SCALING_TABLE), ref)


def test_range_table_bits():
    ref = _u32(_ref_table("hcadequantizer_range_table_float_hex"))
    assert ref.shape == (16,)
    np.testing.assert_array_equal(_bits(T.RANGE_TABLE), ref)


def test_scale_conversion_table_bits():
    ref = _u32(_ref_table("hcadecoder_scale_conversion_table_hex"))
    assert ref.shape == (128,)
    np.testing.assert_array_equal(_bits(T.SCALE_CONVERSION_TABLE), ref)


def test_intensity_ratio_table_bits():
    ref = _u32(_ref_table("hcadecoder_intensity_ratio_table_hex"))
    assert ref.shape == (16,)
    np.testing.assert_array_equal(_bits(T.INTENSITY_RATIO_TABLE), ref)


def test_intensity_ratio_bounds_bits():
    ref = _u32(_ref_table("IntensityRatioBoundsTableHex"))
    assert ref.shape == (14,)
    np.testing.assert_array_equal(_bits(T.INTENSITY_RATIO_BOUNDS), ref)


def test_quantizer_scaling_table_bits():
    ref = _u32(_ref_table("QuantizerScalingTableHex"))
    assert ref.shape == (64,)
    np.testing.assert_array_equal(_bits(T.QUANTIZER_SCALING_TABLE), ref)


def test_quantizer_dead_zone_bits():
    ref = _u32(_ref_table("QuantizerDeadZoneHex"))
    assert ref.shape == (16,)
    np.testing.assert_array_equal(_bits(T.QUANTIZER_DEAD_ZONE), ref)


def test_quantizer_inverse_step_size():
    # stored as decimal float literals in the reference; every value is an
    # exact fp32 (k + 0.5), so literal -> fp32 is still a bit-exact check
    ref = np.float32(_ref_table("QuantizerInverseStepSize"))
    assert ref.shape == (16,)
    np.testing.assert_array_equal(_bits(T.QUANTIZER_INVERSE_STEP_SIZE),
                                  _bits(ref))


def test_read_val_table():
    # reference stores quantised values as floats; ours as i8 — the float
    # table must be exactly the widened integers (all whole, |v| <= 7)
    ref = np.float32(_ref_table("hcatbdecoder_read_val_table"))
    assert ref.shape == (128,)
    np.testing.assert_array_equal(
        _bits(np.float32(np.asarray(T.READ_VAL_TABLE, np.int8))), _bits(ref))


# --- embedded integer tables ------------------------------------------------

@pytest.mark.parametrize("ref_name,ours,shape", [
    ("hcadecoder_invert_table", lambda: T.INVERT_TABLE, (66,)),
    ("ath_base_curve", lambda: T.ATH_BASE_CURVE, (656,)),
    ("hcatbdecoder_max_bit_table", lambda: T.MAX_BIT_TABLE, (16,)),
    ("hcatbdecoder_read_bit_table", lambda: T.READ_BIT_TABLE, (128,)),
    ("ScaleToResolutionCurve", lambda: T.SCALE_TO_RESOLUTION_CURVE, (59,)),
    ("ShuffleTable", lambda: T.SHUFFLE_TABLE, (128,)),
    ("QuantizedSpectrumMaxBits",
     lambda: T.QUANTIZED_SPECTRUM_MAX_BITS, (16,)),
    ("QuantizeSpectrumBits",
     lambda: np.asarray(T.QUANTIZE_SPECTRUM_BITS).reshape(-1), (128,)),
    ("QuantizeSpectrumValue",
     lambda: np.asarray(T.QUANTIZE_SPECTRUM_VALUE).reshape(-1), (128,)),
    ("DefaultChannelMapping", lambda: T.DEFAULT_CHANNEL_MAPPING, (9,)),
    ("ValidChannelMappings",
     lambda: np.asarray(T.VALID_CHANNEL_MAPPINGS).reshape(-1), (64,)),
])
def test_integer_table(ref_name, ours, shape):
    ref = np.asarray(_ref_table(ref_name), dtype=np.int64)
    got = np.asarray(ours(), dtype=np.int64).reshape(-1)
    assert ref.size == int(np.prod(shape))
    np.testing.assert_array_equal(got, ref)


def test_crc16_table():
    ref = np.asarray(_ref_table("hcacommon_crc_mask_table"), dtype=np.uint16)
    assert ref.shape == (256,)
    np.testing.assert_array_equal(CRC16_TABLE, ref)


# --- IMDCT twiddles + window (decoder) --------------------------------------

def test_imdct_sin_cos_bits():
    sin = _u32(_ref_table("sin_tables_hex"))
    cos = _u32(_ref_table("cos_tables_hex"))
    assert sin.shape == cos.shape == (7 * 64,)
    np.testing.assert_array_equal(_bits(T.IMDCT_SIN), sin)
    np.testing.assert_array_equal(_bits(T.IMDCT_COS), cos)


def test_imdct_window_bits():
    ref = _u32(_ref_table("hcaimdct_window_float_hex"))
    assert ref.shape == (128,)
    np.testing.assert_array_equal(_bits(T.IMDCT_WINDOW), ref)


# --- encoder DCT4 twiddles (ragged stages vs the reference's padded rows) ---

def test_dct4_stage_tables_bits():
    # reference: SinTablesHex[8][128] with ragged initializers — row k lists
    # exactly the 2^k entries stage k reads (hca.cpp:2481-2524 indexes
    # SinTablesHex[blockHalfSizeBits] with i < 2^blockHalfSizeBits), so the
    # flat parse is 1+2+...+128 = 255 values matching our flat layout.
    sin = _u32(_ref_table("SinTablesHex"))
    cos = _u32(_ref_table("CosTablesHex"))
    assert sin.shape == cos.shape == (255,)
    np.testing.assert_array_equal(_bits(T.DCT4_SIN_FLAT), sin)
    np.testing.assert_array_equal(_bits(T.DCT4_COS_FLAT), cos)
    for k in range(8):
        s, c = T.dct4_stage_tables(k)
        lo = (1 << k) - 1
        assert s.shape == c.shape == (1 << k,)
        np.testing.assert_array_equal(_bits(s), sin[lo:lo + (1 << k)])
        np.testing.assert_array_equal(_bits(c), cos[lo:lo + (1 << k)])


# --- ATH curve construction -------------------------------------------------

def test_ath_curve_matches_reference_algorithm():
    # re-derive ath_init1 (hca.cpp:456-471) from the parsed base curve and
    # compare our ath_curve() for a spread of sample rates, plus type 0
    base = np.asarray(_ref_table("ath_base_curve"), dtype=np.uint8)

    def ref_ath(sample_rate):
        out = np.zeros(128, dtype=np.uint8)
        acc = 0
        index = 0
        for i in range(128):
            acc += sample_rate
            index = acc >> 13
            if index >= 654:
                out[i:] = 0xFF
                break
            out[i] = base[index]
        return out

    np.testing.assert_array_equal(T.ath_curve(0, 48000),
                                  np.zeros(128, np.uint8))
    for sr in (8000, 16000, 22050, 44100, 48000, 96000):
        np.testing.assert_array_equal(T.ath_curve(1, sr), ref_ath(sr))
