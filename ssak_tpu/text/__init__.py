"""Text normalization: language dispatcher.

Counterpart of reference ssak/utils/text.py (format_text:21)."""

from ssak_tpu.text.basic import (
    collapse_whitespace,
    format_special_characters,
    remove_punctuations,
    remove_special_words,
    transliterate,
)


def format_text(text: str, language: str, **kwargs) -> str:
    """Normalize text for the given language (fr/en/ar/ru)."""
    lang = language.split("-")[0].lower() if language else "fr"
    if lang in ("fr", "en", "es", "it", "pt", "de"):
        from ssak_tpu.text.latin import format_text_latin

        return format_text_latin(text, language=lang, **kwargs)
    if lang == "ar":
        from ssak_tpu.text.ar import format_text_ar

        return format_text_ar(text, **kwargs)
    if lang == "ru":
        from ssak_tpu.text.ru import format_text_ru

        return format_text_ru(text, **kwargs)
    raise NotImplementedError(f"no normalizer for language: {language}")


__all__ = [
    "format_text",
    "collapse_whitespace",
    "format_special_characters",
    "remove_punctuations",
    "remove_special_words",
    "transliterate",
]
