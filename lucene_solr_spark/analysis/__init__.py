from .text import (  # noqa: F401
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    html_strip_series,
    tokenize_series,
    analyze_series,
    analyze_one,
)
