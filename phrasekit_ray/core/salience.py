"""Salience scoring formulas with f32 arithmetic parity.

The reference computes ratio/tfidf in f32 and pmi in f64-cast-to-f32
(reference phrasekit_score.rs:227-252). Threshold comparisons downstream
(`salience < min_salience`) must see the same precision or borderline
phrases flip across the filter (SURVEY.md §7.3), so every function here
returns float32 and performs intermediate math at the reference's width.

Vectorized over numpy arrays; also correct for Python scalars (numpy
broadcasting handles both).
"""

from __future__ import annotations

import numpy as np

PMI_NO_BACKGROUND = np.float32(10.0)  # reference phrasekit_score.rs:237-239


def ratio_salience(domain_count, background_count) -> np.ndarray:
    """domain / (background + 1), all in f32 (phrasekit_score.rs:227-229)."""
    d = np.asarray(domain_count).astype(np.float32)
    b1 = (np.asarray(background_count, dtype=np.uint64) + 1).astype(np.float32)
    return d / b1


def pmi_salience(domain_count, background_count, total_domain: int, total_background: int) -> np.ndarray:
    """log2((d/total_d) / (b/total_b)) in f64, cast f32; b==0 -> 10.0
    (phrasekit_score.rs:231-246)."""
    d = np.asarray(domain_count, dtype=np.float64)
    b = np.asarray(background_count, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        p_domain = d / np.float64(total_domain)
        p_background = b / np.float64(total_background)
        pmi = np.log2(p_domain / p_background)
    out = pmi.astype(np.float32)
    return np.where(np.asarray(background_count) == 0, PMI_NO_BACKGROUND, out)


def tfidf_salience(domain_count, background_count, total_domain: int) -> np.ndarray:
    """tf = d/total_d; idf = ln((total_d+1)/(b+1)); tf*idf, all f32.

    NOTE doc/code mismatch in the reference (SURVEY.md F3): the docs describe
    document-frequency idf but the code uses background_count and the total
    domain n-gram count — this implements the CODE
    (phrasekit_score.rs:248-252).
    """
    d = np.asarray(domain_count).astype(np.float32)
    b1 = (np.asarray(background_count, dtype=np.uint64) + 1).astype(np.float32)
    tf = d / np.float32(total_domain)
    idf = np.log((np.float32(np.uint64(total_domain) + 1)) / b1, dtype=np.float32)
    return tf * idf


def compute_salience(method: str, domain_count, background_count,
                     total_domain: int, total_background: int) -> np.ndarray:
    if method == "ratio":
        return ratio_salience(domain_count, background_count)
    if method == "pmi":
        return pmi_salience(domain_count, background_count, total_domain, total_background)
    if method == "tfidf":
        return tfidf_salience(domain_count, background_count, total_domain)
    raise ValueError(f"Invalid method: {method}. Must be 'ratio', 'pmi', or 'tfidf'")


def salience_score(salience, count) -> np.ndarray:
    """Runtime ranking score: salience * ln(count + 1) in f32
    (reference payload.rs:23-25); used by the salience_max policy."""
    s = np.asarray(salience).astype(np.float32)
    c1 = (np.asarray(count, dtype=np.uint64) + 1).astype(np.float32)
    return s * np.log(c1, dtype=np.float32)
