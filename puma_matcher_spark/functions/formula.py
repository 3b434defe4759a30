"""Chemical-formula detection (FormulaAnalyser rebuild).

Reference: utils/nlp/FormulaAnalyser/service/WordService.java:34-56 +
DictionaryService.java:25-90 classify words into formula / chemical-
element / ordinary-word classes using element-symbol regexes and
dictionaries.

Rebuild: a single Catalyst regex built from the public periodic-table
symbol list — a token is a candidate formula when it is fully tiled by
element symbols + digits/parens and contains at least one digit or ≥2
element symbols (filters plain English words); a broadcast dictionary
check removes dictionary words that happen to tile (e.g. 'CoIn').
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Public periodic-table symbols, longest-first so the alternation tiles
# greedily ('Co' before 'C').
ELEMENTS = (
    "He Li Be Ne Na Mg Al Si Cl Ar Ca Sc Ti Cr Mn Fe Co Ni Cu Zn Ga Ge As "
    "Se Br Kr Rb Sr Zr Nb Mo Tc Ru Rh Pd Ag Cd In Sn Sb Te Xe Cs Ba La Ce "
    "Pr Nd Pm Sm Eu Gd Tb Dy Ho Er Tm Yb Lu Hf Ta Re Os Ir Pt Au Hg Tl Pb "
    "Bi Po At Rn Fr Ra Ac Th Pa Np Pu Am Cm Bk Cf Es Fm Md No Lr "
    "H B C N O F P S K V Y I W U"
).split()

_ELEM_ALT = "|".join(sorted(ELEMENTS, key=len, reverse=True))
FORMULA_RE = rf"^(?:(?:{_ELEM_ALT})[0-9]*(?:\([0-9]+\))?)+$"


def is_formula_candidate(token: Column) -> Column:
    """Token fully tiled by element symbols with optional counts, and not
    a plain alphabetic word of one element symbol."""
    tiled = token.rlike(FORMULA_RE)
    has_digit = token.rlike("[0-9]")
    multi_symbol = F.length(token) >= 4
    return tiled & (has_digit | multi_symbol)


def extract_formulas(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "document_version_id",
    dictionary: tuple[str, ...] = (),
) -> DataFrame:
    """(doc, formula) rows for formula-shaped tokens, minus dictionary
    words (DictionaryService semantics via a broadcast exclusion set)."""
    toks = docs.select(
        F.col(id_col).alias("document_version_id"),
        F.explode(
            F.filter(
                F.split(F.col(text_col), r"[^A-Za-z0-9()]+"),
                lambda x: x != F.lit(""),
            )
        ).alias("token"),
    )
    out = toks.where(is_formula_candidate(F.col("token")))
    if dictionary:
        excl = F.array(*[F.lit(w) for w in dictionary])
        out = out.where(~F.array_contains(excl, F.lower(F.col("token"))))
    return out.withColumnRenamed("token", "formula").distinct()
