"""Lowercase-parity and tokenization tests (SURVEY.md §1.4 invariant)."""

import pyarrow as pa

from phrasekit_ray.core import normalize


PROBES = [
    "İstanbul",      # U+0130 -> "i" + U+0307 (Rust to_lowercase parity)
    "STRASSE",
    "ß",
    "Hello World",
    "ΑΣ",            # Greek final sigma
    "ΣΙΣΥΦΟΣ",
    "MACHINE",
    "already lower",
    "",
    "ÀÉÎÕÜ",
    "日本語テスト",
]


def test_lower_string_array_matches_python_lower():
    arr = pa.array(PROBES)
    got = normalize.lower_string_array(arr).to_pylist()
    want = [s.lower() for s in PROBES]
    assert got == want


def test_lower_token_lists():
    arr = pa.array([["The", "RAT", "İ"], [], ["ß", "CDK10"]])
    got = normalize.lower_token_lists(arr).to_pylist()
    assert got == [["the", "rat", "İ".lower()], [], ["ß", "cdk10"]]


def test_tokenize_matches_str_split():
    texts = [
        "the rat cdk10 oligo",
        "  leading and trailing  ",
        "a  b   c",
        "",
        "   ",
        "one",
        "tab\tand\nnewline mix",
    ]
    got = normalize.tokenize_string_array(pa.array(texts), lowercase=False).to_pylist()
    assert got == [t.split() for t in texts]


def test_tokenize_lowercases():
    got = normalize.tokenize_string_array(pa.array(["The RAT İ"])).to_pylist()
    assert got == [["the", "rat", "İ".lower()]]


def test_extract_text_from_html_basic():
    html = b"<html><body><p>the rat cdk10 oligo</p></body></html>"
    assert normalize.extract_text_from_html(html) == "the rat cdk10 oligo"


def test_extract_text_strips_script_style_and_entities():
    html = (
        b"<html><head><style>p{color:red}</style>"
        b"<script>var x = '<p>no</p>';</script></head>"
        b"<body><!-- comment --><p>a &amp; b&nbsp;&lt;c&gt;</p></body></html>"
    )
    assert normalize.extract_text_from_html(html) == 'a & b <c>'


def test_extract_text_roundtrip_is_deterministic():
    html = b"<html><body><p>add protein   assay buffer</p></body></html>"
    a = normalize.extract_text_from_html(html)
    b = normalize.extract_text_from_html(html)
    assert a == b == "add protein assay buffer"


def test_null_rows_preserved_across_paths():
    """Null string rows must stay null (not become empty lists) on every
    tokenize/lowercase path — validity bitmap carried through from_arrays."""
    import pyarrow as pa

    arr = pa.array(["A b", None])
    assert normalize.tokenize_string_array(arr, lowercase=True).to_pylist() == [
        ["a", "b"],
        None,
    ]
    assert normalize.tokenize_string_array(arr, lowercase=False).to_pylist() == [
        ["A", "b"],
        None,
    ]
    # empty-token filter path (leading/trailing whitespace) with nulls
    messy = pa.array(["  A  b ", None, " "])
    assert normalize.tokenize_string_array(messy).to_pylist() == [
        ["a", "b"],
        None,
        [],
    ]
    lists = pa.array([["A"], None, ["B", "C"]])
    assert normalize.lower_token_lists(lists).to_pylist() == [["a"], None, ["b", "c"]]
