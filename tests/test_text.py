"""Text normalization tests.

The French cases mirror the behaviors pinned by the reference golden corpus
(tests/expected/format_text/output.txt) — exact-string assertions in the
style of reference tests/unittests/test_format_text.py.
"""

import os
import pytest

from ssak_tpu.text import (
    collapse_whitespace,
    format_text,
    remove_punctuations,
    remove_special_words,
    transliterate,
)
from ssak_tpu.text.numbers import (
    decimal_to_words,
    en_cardinal,
    en_ordinal,
    fr_cardinal,
    fr_ordinal,
    roman_to_decimal,
)


class TestFrenchNumbers:
    @pytest.mark.parametrize(
        "n,expected",
        [
            (0, "zéro"),
            (16, "seize"),
            (21, "vingt et un"),
            (71, "soixante et onze"),
            (73, "soixante-treize"),
            (80, "quatre-vingts"),
            (81, "quatre-vingt-un"),
            (95, "quatre-vingt-quinze"),
            (100, "cent"),
            (123, "cent vingt-trois"),
            (200, "deux cents"),
            (231, "deux cent trente et un"),
            (600, "six cents"),
            (1000, "mille"),
            (2008, "deux mille huit"),
            (47000, "quarante-sept mille"),
            (80000, "quatre-vingt mille"),
            (94306, "quatre-vingt-quatorze mille trois cent six"),
            (707790, "sept cent sept mille sept cent quatre-vingt-dix"),
            (1000000, "un million"),
            (2000000, "deux millions"),
            (1500000000, "un milliard cinq cents millions"),
        ],
    )
    def test_cardinal(self, n, expected):
        assert fr_cardinal(n) == expected

    @pytest.mark.parametrize(
        "n,expected",
        [(1, "premier"), (2, "deuxième"), (4, "quatrième"), (5, "cinquième"), (9, "neuvième"), (19, "dix-neuvième"), (21, "vingt et unième"), (50, "cinquantième"), (1000, "millième")],
    )
    def test_ordinal(self, n, expected):
        assert fr_ordinal(n) == expected

    def test_decimal(self):
        assert decimal_to_words("5,5", "fr") == "cinq virgule cinq"
        assert decimal_to_words("0,95", "fr") == "zéro virgule quatre-vingt-quinze"
        assert decimal_to_words("8,00", "fr") == "huit virgule zéro zéro"
        assert decimal_to_words("34,0", "fr") == "trente-quatre virgule zéro"


class TestEnglishNumbers:
    @pytest.mark.parametrize(
        "n,expected",
        [
            (0, "zero"),
            (13, "thirteen"),
            (42, "forty-two"),
            (100, "one hundred"),
            (123, "one hundred and twenty-three"),
            (1000, "one thousand"),
            (1234, "one thousand two hundred and thirty-four"),
            (1000000, "one million"),
        ],
    )
    def test_cardinal(self, n, expected):
        assert en_cardinal(n) == expected

    @pytest.mark.parametrize(
        "n,expected",
        [(1, "first"), (2, "second"), (3, "third"), (12, "twelfth"), (20, "twentieth"), (21, "twenty-first"), (100, "one hundredth")],
    )
    def test_ordinal(self, n, expected):
        assert en_ordinal(n) == expected


def test_roman():
    assert roman_to_decimal("XIX") == 19
    assert roman_to_decimal("IV") == 4
    assert roman_to_decimal("MCMXCIX") == 1999
    assert roman_to_decimal("BONJOUR") is None
    assert roman_to_decimal("") is None


class TestFrenchNormalization:
    """Exact strings pinned from the reference golden corpus behaviors."""

    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("Le 9/02/2008 à 20h30 Autour des oeuvres de Paul Ladmirault .", "le neuf février deux mille huit à vingt heures trente autour des oeuvres de paul ladmirault"),
            ("Chats de moins de 4 kg : 1 comprimé par jour .", "chats de moins de quatre kilogrammes un comprimé par jour"),
            ("plus de 80 % ,", "plus de quatre-vingts pour cent"),
            ("Tél. : 05 53 66 16 68 .", "tél zéro cinq cinquante-trois soixante-six seize soixante-huit"),
            ("elle compte 707 790 salariés au 31 décembre 2000", "elle compte sept cent sept mille sept cent quatre-vingt-dix salariés au trente et un décembre deux mille"),
            ("le 01 Aout 2007", "le zéro un aout deux mille sept"),
            ("la demande du 1er janvier 2004 au XIXème siècle", "la demande du premier janvier deux mille quatre au dix-neuvième siècle"),
            ("après le 31.12.2003 ,", "après le trente et un point douze point deux mille trois"),
            ("Vitamine B6 : 0,6 mg", "vitamine b six zéro virgule six milligrammes"),
            ("Biotine : 12,5 µg", "biotine douze virgule cinq micro grammes"),
            ("Vitamines A : 50,0 U.I.", "vitamines a cinquante virgule zéro u point i point"),
            ("Abonnez -vous pour 2 ans !", "abonnez vous pour deux ans"),
            ("PET-PHOS® Félin", "pet-phos félin"),
            ("Dim : 39 x31x30cm.Polyester 600 deniers", "dim trente-neuf x trente et un x trente centimètres point polyester six cents deniers"),
        ],
    )
    def test_golden_behaviors(self, raw, expected):
        assert format_text(raw, "fr") == expected

    def test_parentheses_extraction(self):
        out = format_text("Vitamine B5 ( acide pantothénique ) : 0,5 mg", "fr")
        assert out == "vitamine b cinq zéro virgule cinq milligrammes\nacide pantothénique"

    def test_url(self):
        out = format_text("http://example.fr/ ici", "fr")
        assert out == "http deux points slash slash example point fr slash ici"

    def test_tags_removed(self):
        assert format_text("bonjour <noise> toi", "fr") == "bonjour toi"


class TestBasic:
    def test_collapse(self):
        assert collapse_whitespace("  a \t b\nc ") == "a b c"

    def test_punct(self):
        assert remove_punctuations("a, b! (c)") == "a b c"

    def test_special_words(self):
        assert remove_special_words("a <noise> b [laughter] c") == "a b c"

    def test_transliterate(self):
        assert transliterate("éèêëàçœ") == "eeeeacoe"


class TestArabic:
    def test_digits(self):
        from ssak_tpu.text.ar import ar_cardinal

        assert ar_cardinal(1) == "واحد"
        assert ar_cardinal(25) == "خمسة وعشرون"
        assert ar_cardinal(100) == "مائة"
        assert ar_cardinal(2000) == "ألفان"

    def test_format(self):
        out = format_text("مرحبا ١٢", "ar")
        assert "١" not in out and "12" not in out

    def test_diacritics(self):
        from ssak_tpu.text.ar import remove_diacritics

        assert remove_diacritics("مَرْحَبًا") == "مرحبا"

    def test_buckwalter(self):
        from ssak_tpu.text.ar import to_buckwalter

        assert to_buckwalter("باب") == "bAb"


class TestRussian:
    def test_cardinal(self):
        from ssak_tpu.text.ru import ru_cardinal

        assert ru_cardinal(1) == "один"
        assert ru_cardinal(21) == "двадцать один"
        assert ru_cardinal(1000) == "одна тысяча"
        assert ru_cardinal(2000) == "две тысячи"
        assert ru_cardinal(5000) == "пять тысяч"
        assert ru_cardinal(1000000) == "один миллион"

    def test_format(self):
        assert format_text("Привет, мир 42!", "ru") == "привет мир сорок два"


def test_ar_text_augmenter_deterministic_variants():
    """Arabic label-text augmentation (reference whisper_train.py:302-336):
    digit verbalization and punctuation keep/strip variants, deterministic
    under seed, terminal dot added when punctuation kept."""
    from ssak_tpu.text.ar import make_text_augmenter

    aug = make_text_augmenter("ar", seed=0)
    text = "ذهبت إلى السوق، واشتريت 3 تفاحات"
    outs = {aug(text) for _ in range(20)}
    assert 1 < len(outs) <= 4, outs  # stochastic but bounded variants
    # deterministic replay
    aug2 = make_text_augmenter("ar", seed=0)
    outs2 = [aug2(text) for _ in range(20)]
    aug3 = make_text_augmenter("ar", seed=0)
    assert outs2 == [aug3(text) for _ in range(20)]
    # every kept-punctuation variant terminates a sentence
    for o in outs:
        if "،" in o:
            assert o.endswith(tuple(",-:!;.؛؟،?_")), o
    import pytest

    with pytest.raises(NotImplementedError):
        make_text_augmenter("fr")


# --- reference golden-corpus non-regression -------------------------------
# Mirrors reference tests/unittests/test_format_text.py:196 test_non_regression_fr:
# the frwac corpus is normalized through the clean_text CLI and the output,
# mined acronyms, and removed special characters must match the reference
# goldens byte-for-byte.

_REF_FRWAC = "/root/reference/tests/data/text/frwac.txt"
_REF_EXPECTED = "/root/reference/tests/expected/format_text"


class TestGoldenCorpus:
    def _run(self, tmp_path):
        import subprocess
        import sys as _sys

        out = tmp_path / "output.txt"
        acr = tmp_path / "acronyms.txt"
        spc = tmp_path / "special_chars.txt"
        r = subprocess.run(
            [
                _sys.executable,
                os.path.join(os.path.dirname(__file__), "..", "tools", "clean_text.py"),
                _REF_FRWAC, str(out),
                "--empty_string_policy=ignore", "--linebreak_policy=allow",
                "--extract_parenthesis", "--file_acro", str(acr),
                "--file_special", str(spc),
            ],
            capture_output=True, text=True,
        )
        assert r.returncode == 0, r.stderr
        return out, acr, spc

    def test_golden_exact(self, tmp_path):
        import pytest

        if not os.path.exists(_REF_FRWAC):
            pytest.skip("reference corpus not available")
        out, acr, spc = self._run(tmp_path)
        for got, want in [
            (out, "output.txt"), (acr, "acronyms.txt"), (spc, "special_chars.txt"),
        ]:
            expected = open(os.path.join(_REF_EXPECTED, want), encoding="utf-8").read()
            assert got.read_text(encoding="utf-8") == expected, f"{want} diverges"
