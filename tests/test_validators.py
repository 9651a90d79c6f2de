"""Unit tests for algorithmic PII validation (a gap in the reference's own
suite — it never tests validators in isolation; SURVEY.md §5)."""

from pii_filter_spark.core.normalizers import normalize_pii_value
from pii_filter_spark.core.validators import (
    is_plausible_cpf,
    is_valid_cnh,
    is_valid_cnpj,
    is_valid_cpf,
    validate_pii,
)


def test_cpf_plausibility_not_checksum():
    # checksum-INVALID but plausible: must validate (fail-safe masking)
    assert is_plausible_cpf("123.456.789-00")
    assert not is_valid_cpf("123.456.789-00")
    assert validate_pii("CPF", "123.456.789-00")


def test_cpf_all_equal_rejected():
    assert not is_plausible_cpf("111.111.111-11")
    assert not validate_pii("CPF", "00000000000")


def test_cpf_wrong_length():
    assert not is_plausible_cpf("1234567890")
    assert not is_plausible_cpf("123456789012")


def test_cpf_checksum_valid():
    # 529.982.247-25 is the canonical valid example
    assert is_valid_cpf("529.982.247-25")
    assert not is_valid_cpf("529.982.247-24")


def test_cnpj():
    assert is_valid_cnpj("11.222.333/0001-81")
    assert not is_valid_cnpj("11.222.333/0001-82")
    assert not is_valid_cnpj("11.111.111/1111-11")


def test_cnh():
    # construct a valid CNH: digits 12345678900 -> compute dv per DENATRAN
    base = [1, 2, 3, 4, 5, 6, 7, 8, 9]
    dv1 = sum(n * (9 - i) for i, n in enumerate(base)) % 11
    dv1 = 0 if dv1 >= 10 else dv1
    dv2 = sum(n * (1 + i) for i, n in enumerate(base)) % 11
    dv2 = 0 if dv2 >= 10 else dv2
    cnh = "".join(map(str, base + [dv1, dv2]))
    assert is_valid_cnh(cnh)
    assert not is_valid_cnh(cnh[:-1] + str((int(cnh[-1]) + 1) % 10))


def test_email_structural():
    assert validate_pii("EMAIL", "a.b@c.com")
    assert not validate_pii("EMAIL", "a..b@c.com")
    assert not validate_pii("EMAIL", "abc.com")


def test_cep_and_phone():
    assert validate_pii("CEP", "01310-100")
    assert not validate_pii("CEP", "0131-100")
    assert validate_pii("TELEFONE", "(11) 98765-4321")
    assert not validate_pii("TELEFONE", "123-456")


def test_unknown_type_defaults_valid():
    assert validate_pii("RG", "anything")
    assert validate_pii("WHATEVER", "x")


def test_normalizers():
    assert normalize_pii_value("CPF", "123.456.789-00") == "12345678900"
    assert normalize_pii_value("EMAIL", "A.B@C.COM") == "a.b@c.com"
    assert normalize_pii_value("CEP", "01310100") == "01310-100"
    assert normalize_pii_value("NOME_COMPLETO", "Ana Silva") == "Ana Silva"
