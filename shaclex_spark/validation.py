"""The constraint compiler + validator: shapes × triples → conformance.

Set-at-a-time re-expression of shaclex's node-at-a-time validators
(/root/reference/modules/slang/src/main/scala/es/weso/slang/Validation.scala,
ValidateND.scala). The plan per shape is the datalog program shaclex's
own ASP encoding spells out (SLang2Clingo.scala:148-181):

    arcWithShape(X,P,S,V) :- arc(X,P,V), hasShape(V,S).     -- join
    countPropShape(X,P,S,C) :- #count{V: arcWithShape(...)}  -- groupBy
    hasShape(X, qa(PP,S,Min,Max)) :- Min <= C <= Max.        -- filter

Physical shape (SURVEY.md §4.3): per shape, ONE left join
candidates ⋈ triples on subj (left so zero-arc nodes still count 0 —
SLang2Clingo.scala:164-168 makes the 0-case explicit), then ONE
groupBy(candidate) with fused conditional aggregates for every
constraint sharing the simple-predicate path family (the FlatShape
constraint-fusion idea, FlatShapeConversion.scala:27-87). Complex
paths / sibling-path joins (equals, lessThan) run as separate
sub-aggregations joined back on the candidate key.

Recursion: stratified SCC order; cyclic strata run a greatest-fixpoint
loop starting from all-conforming — the co-inductive Unknown-counts-
as-ok semantics of ValidateND (ShapesMap.scala:19-23). Negated cycles
are rejected at schema parse (shapes.SchemaDict.check_well_formed).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .model import (
    NODE_KINDS,
    NUMERIC_DATATYPES,
    RDF_TYPE,
    TEMPORAL_DATATYPES,
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_INTEGER,
    XSD_STRING,
)
from .paths import path_pairs
from .shapes import NodeExpr, PropertyConstraint, SchemaDict, Shape, ValueSpec

MAX_FIXPOINT_ROUNDS = 50

KEY = "node_key"
FCOLS = ["f_kind", "f_value", "f_dt", "f_lang"]


def node_key_col(kind: Column, value: Column, dt: Column, lang: Column) -> Column:
    """Single string identity key for an RDF term (null-safe on dt/lang).

    Fields join on an ASCII \\x01 separator (an empty separator would
    collide literal "aX"^^<b> with "a"^^<Xb> -- this key is the
    join/dedup identity for candidates, ref joins and sh:equals, so a
    collision silently merges distinct terms). Null dt/lang map to a
    DISTINCT \\x02 marker so an absent datatype cannot collide with an
    empty-string one."""
    return F.concat_ws("", kind, value, F.coalesce(dt, F.lit("")),
                       F.coalesce(lang, F.lit("")))


def focus_to_candidates(focus: DataFrame) -> DataFrame:
    """focus(node, shape, ...) → per-shape candidate rows with term columns.

    If the focus carries full term columns (node_kind/node_dt/
    node_lang — emitted by triggers for literal targetNode terms),
    they are honored; otherwise the kind is inferred from the '_:'
    bnode prefix convention."""
    inferred = F.when(F.col("node").startswith("_:"), F.lit("bnode")) \
        .otherwise(F.lit("iri"))
    if "node_kind" in focus.columns:
        kind = F.coalesce(F.col("node_kind"), inferred)
        dt = F.col("node_dt")
        lang = F.col("node_lang")
    else:
        kind, dt, lang = inferred, F.lit(None).cast("string"), \
            F.lit(None).cast("string")
    return focus.select(
        F.col("shape"),
        kind.alias("f_kind"),
        F.col("node").alias("f_value"),
        dt.alias("f_dt"),
        lang.alias("f_lang"),
    ).withColumn(KEY, node_key_col(F.col("f_kind"), F.col("f_value"),
                                   F.col("f_dt"), F.col("f_lang"))).distinct()


# --------------------------------------------------------------------------
# Value-term accessors: evaluate a NodeExpr against some column family.
# --------------------------------------------------------------------------


@dataclass
class TermCols:
    """Column accessors for the term a NodeExpr is applied to, plus the
    join-backed boolean columns (shape refs, class membership)."""

    kind: Column
    value: Column
    dt: Column
    lang: Column
    ref_cols: dict[str, Column]
    cls_cols: dict[str, Column]


def _well_formed(dt_iri: str, value: Column) -> Column:
    """Literal well-formedness vs datatype: ill-formed ⇒ violation, not
    skip (SURVEY.md §7.3 'typed literal comparison'; exercised by
    shacl/tests/core/node/datatype-001.ttl and the ShEx suite's
    sht:ValidLexicalForm entries — e.g. '1E0' is a valid double but an
    invalid integer/decimal). Anchored per-datatype regexes from
    model.LEXICAL_FORMS; unknown datatypes are unconstrained."""
    from .model import INTEGER_RANGES, LEXICAL_FORMS

    pat = LEXICAL_FORMS.get(dt_iri)
    if pat is None:
        return F.lit(True)
    ok = value.rlike(f"^({pat})$")
    rng = INTEGER_RANGES.get(dt_iri)
    if rng is not None:
        # lexically valid but out of the bounded type's value space ⇒
        # ill-formed ("32768"^^xsd:short). decimal(38,0) covers 2^64.
        dec = value.try_cast("decimal(38,0)")
        lo = F.lit(str(rng[0])).cast("decimal(38,0)")
        hi = F.lit(str(rng[1])).cast("decimal(38,0)")
        ok = ok & dec.isNotNull() & (dec >= lo) & (dec <= hi)
    return ok


def _numeric_value(tc: TermCols) -> Column:
    """Typed comparable rendering of a literal for range constraints."""
    return F.when(tc.dt.isin(list(TEMPORAL_DATATYPES)),
                  tc.value.try_cast("timestamp").cast("double")
                  ).otherwise(tc.value.try_cast("double"))


_TZ_RE = r"(Z|[+-]\d\d:\d\d)$"


def _range_check(e: NodeExpr, tc: TermCols) -> Column:
    lit_raw = e.value
    tz_guard = F.lit(True)
    dec_cmp = None
    try:
        bound = F.lit(float(lit_raw))
        val = _numeric_value(tc)
        # value comparison is defined on numeric datatypes only: a
        # castable-but-non-numeric literal (e.g. "5"^^xsd:string) is a
        # type error ⇒ violation (SPARQL '<' semantics / ShEx numeric
        # facets). NULL dt never compares.
        tz_guard = F.coalesce(
            tc.dt.isin(list(NUMERIC_DATATYPES | TEMPORAL_DATATYPES)),
            F.lit(False))
        # exact decimal comparison when both sides fit decimal(38,15):
        # doubles lose integer precision past 2^53, so
        # "10000000000000000001"^^xsd:decimal vs bound ...000 would
        # compare equal under double math. Falls back to double for
        # exponent forms ("1E0") / overflow (try_cast ⇒ NULL).
        bound_dec = F.lit(lit_raw).try_cast("decimal(38,15)")
        val_dec = tc.value.try_cast("decimal(38,15)")
        dec_cmp = (bound_dec.isNotNull() & val_dec.isNotNull(),
                   val_dec, bound_dec)
    except ValueError:
        # temporal bound. XSD dateTime ordering between zoned and
        # unzoned values is indeterminate ⇒ violation (W3C
        # minInclusive-003): require equal timezone-ness.
        import re as _re

        bound = F.lit(lit_raw).cast("timestamp").cast("double")
        val = tc.value.try_cast("timestamp").cast("double")
        bound_has_tz = bool(_re.search(_TZ_RE, lit_raw))
        tz_guard = ((tc.value.rlike(_TZ_RE) == F.lit(bound_has_tz))
                    & F.coalesce(tc.dt.isin(list(TEMPORAL_DATATYPES)),
                                 F.lit(False)))

    def _op(v, b):
        return {
            "minInclusive": v >= b,
            "maxInclusive": v <= b,
            "minExclusive": v > b,
            "maxExclusive": v < b,
        }[e.kind]

    cmp = _op(val, bound)
    if dec_cmp is not None:
        both_dec, val_dec, bound_dec = dec_cmp
        cmp = F.when(both_dec, _op(val_dec, bound_dec)).otherwise(cmp)
    # non-literal or non-comparable value ⇒ violation (never null)
    return (tc.kind == "literal") & val.isNotNull() & tz_guard & cmp


def _value_match(v: ValueSpec, tc: TermCols) -> Column:
    if v.kind == "iriStem":
        return (tc.kind == "iri") & tc.value.startswith(v.value)
    if v.kind == "literalStem":
        return (tc.kind == "literal") & tc.value.startswith(v.value)
    if v.kind == "language":
        # ShExJ Language member: matches any literal carrying exactly
        # this language tag (case-insensitive), regardless of value.
        return F.coalesce((tc.kind == "literal")
                          & (F.lower(tc.lang) == v.value.lower()),
                          F.lit(False))
    if v.kind == "languageStem":
        low = v.value.lower()
        if low == "":  # empty stem = any language-tagged literal
            return (tc.kind == "literal") & tc.lang.isNotNull()
        return ((tc.kind == "literal") & tc.lang.isNotNull()
                & ((F.lower(tc.lang) == low)
                   | F.lower(tc.lang).startswith(low + "-")))
    if v.kind == "iri":
        return (tc.kind == "iri") & (tc.value == v.value)
    if v.kind == "bnode":
        return (tc.kind == "bnode") & (tc.value == v.value)
    dt = v.dt or (None if v.lang else XSD_STRING)
    cond = (tc.kind == "literal") & (tc.value == v.value)
    if v.lang:
        # NULL guard: a plain literal has lang NULL; `lower(NULL) == x`
        # is NULL, which would leak through sh:in/hasValue/xone into
        # conformance as a spurious match (the 'never null' invariant).
        cond = cond & tc.lang.isNotNull() & (F.lower(tc.lang) == v.lang.lower())
    elif dt:
        # RDF 1.1: a simple literal IS an xsd:string — sources that
        # leave dt NULL for plain literals must still match "foo"; and
        # a lang-tagged literal must NOT match a plain/typed value.
        cond = (cond & tc.lang.isNull()
                & (F.coalesce(tc.dt, F.lit(XSD_STRING)) == dt))
    return F.coalesce(cond, F.lit(False))


def _lang_in(langs: tuple[str, ...], lang: Column) -> Column:
    low = F.lower(lang)
    conds = [(low == l.lower()) | low.startswith(l.lower() + "-") for l in langs]
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return lang.isNotNull() & out


def compile_expr(e: NodeExpr, tc: TermCols) -> Column:
    """NodeExpr → boolean Column (never null: every branch is
    null-coalesced so 4-valued gaps can't leak into aggregates)."""
    k = e.kind
    if k == "true":
        return F.lit(True)
    if k == "false":
        return F.lit(False)
    if k == "datatype":
        # NULL-dt literal ⇒ simple literal ⇒ xsd:string (RDF 1.1);
        # coalesce keeps the branch boolean, never NULL.
        return ((tc.kind == "literal")
                & (F.coalesce(tc.dt, F.lit(XSD_STRING)) == e.iri)
                & _well_formed(e.iri, tc.value))
    if k == "nodeKind":
        return tc.kind.isin(list(NODE_KINDS[e.enum]))
    if k == "in":
        out = _value_match(e.values[0], tc)
        for v in e.values[1:]:
            out = out | _value_match(v, tc)
        return out
    if k == "hasValue":  # node-position semantics: the term IS the value
        return _value_match(e.values[0], tc)
    if k in ("pattern", "minLength", "maxLength"):
        # ShEx string facets apply to the bnode LABEL (sans '_:');
        # SHACL says a bnode violates these components outright.
        if e.shex:
            sval = F.when(tc.kind == "bnode",
                          tc.value.substr(F.lit(3), F.length(tc.value))
                          ).otherwise(tc.value)
            guard = F.lit(True)
        else:
            sval = tc.value
            guard = tc.kind != "bnode"
        if k == "pattern":
            pat = e.pattern
            if e.flags and "i" in e.flags:
                pat = "(?i)" + pat
            return guard & sval.rlike(pat)
        if k == "minLength":
            return guard & (F.length(sval) >= e.num)
        return guard & (F.length(sval) <= e.num)
    if k in ("minInclusive", "maxInclusive", "minExclusive", "maxExclusive"):
        return _range_check(e, tc)
    if k in ("totalDigits", "fractionDigits"):
        # XSD digit facets constrain the decimal family VALUE: sign,
        # leading integer zeros and trailing fraction zeros don't count
        # (ShExJ keys totaldigits/fractiondigits; suite traits
        # sht:TotalDigitsFacet / sht:FractionDigitsFacet).
        from .model import INTEGER_DATATYPES, XSD_DECIMAL

        decimal_family = INTEGER_DATATYPES | {XSD_DECIMAL}
        # the literal must be well-formed FOR ITS OWN datatype: e.g.
        # "1.2345"^^xsd:integer is malformed, so the facet fails
        # (suite 1literalTotaldigits_fail-malformedxsd_integer-1_2345)
        lex_ok = F.when(
            tc.dt.isin(list(INTEGER_DATATYPES)), tc.value.rlike(r"^[+-]?\d+$")
        ).otherwise(tc.value.rlike(r"^[+-]?(\d+(\.\d*)?|\.\d+)$"))
        no_sign = F.regexp_replace(tc.value, r"^[+-]", "")
        int_part = F.regexp_replace(
            F.regexp_extract(no_sign, r"^(\d*)", 1), r"^0+", "")
        frac_part = F.regexp_replace(
            F.regexp_extract(no_sign, r"\.(\d*)$", 1), r"0+$", "")
        if k == "totalDigits":
            cnt = F.length(int_part) + F.length(frac_part)
        else:
            cnt = F.length(frac_part)
        return ((tc.kind == "literal")
                & F.coalesce(tc.dt.isin(list(decimal_family)), F.lit(False))
                & lex_ok & (cnt <= e.num))
    if k == "languageIn":
        return _lang_in(e.langs, tc.lang)
    if k == "class":
        return F.coalesce(tc.cls_cols[e.iri], F.lit(False))
    if k == "ref":
        return F.coalesce(tc.ref_cols[e.label], F.lit(False))
    if k == "not":
        return ~compile_expr(e.exprs[0], tc)
    if k in ("and", "allOf"):
        out = compile_expr(e.exprs[0], tc)
        for sub in e.exprs[1:]:
            out = out & compile_expr(sub, tc)
        return out
    if k == "or":
        out = compile_expr(e.exprs[0], tc)
        for sub in e.exprs[1:]:
            out = out | compile_expr(sub, tc)
        return out
    if k == "xone":
        total = F.lit(0)
        for sub in e.exprs:
            total = total + compile_expr(sub, tc).cast("int")
        return total == 1
    raise ValueError(f"cannot compile node expr kind {k}")


COMPONENT_NAMES = {
    "datatype": "DatatypeConstraintComponent",
    "nodeKind": "NodeKindConstraintComponent",
    "in": "InConstraintComponent",
    "hasValue": "HasValueConstraintComponent",
    "pattern": "PatternConstraintComponent",
    "minLength": "MinLengthConstraintComponent",
    "maxLength": "MaxLengthConstraintComponent",
    "minInclusive": "MinInclusiveConstraintComponent",
    "maxInclusive": "MaxInclusiveConstraintComponent",
    "minExclusive": "MinExclusiveConstraintComponent",
    "maxExclusive": "MaxExclusiveConstraintComponent",
    "languageIn": "LanguageInConstraintComponent",
    "class": "ClassConstraintComponent",
    "ref": "NodeConstraintComponent",
    "not": "NotConstraintComponent",
    "and": "AndConstraintComponent",
    "or": "OrConstraintComponent",
    "xone": "XoneConstraintComponent",
    "true": "TrueConstraintComponent",
    "false": "FalseConstraintComponent",
}


def _top_conjuncts(e: NodeExpr) -> list[NodeExpr]:
    """Flatten synthetic allOf conjunctions so each constraint reports
    under its own component; sh:and stays intact (it reports as
    AndConstraintComponent per SHACL)."""
    if e.kind == "allOf":
        out: list[NodeExpr] = []
        for sub in e.exprs:
            out.extend(_top_conjuncts(sub))
        return out
    return [e]


def _collect_refs(e: NodeExpr) -> set[str]:
    return {lbl for lbl, _ in e.refs()}


def _collect_classes(e: NodeExpr) -> set[str]:
    return e.classes()



def direct_membership(triples: DataFrame) -> DataFrame:
    """Direct rdf:type (inst, cls) relation — class_membership minus
    the subClassOf closure, for graphs known to carry no subclass
    arcs."""
    return (triples.filter((F.col("pred") == RDF_TYPE)
                           & (F.col("obj_kind") == "iri"))
            .select(F.col("subj").alias("inst"),
                    F.col("obj_value").alias("cls"))
            .distinct())


def membership_for(triples: DataFrame) -> DataFrame:
    """Class-membership relation, reusing session-shared derived state
    when the triples object carries it (queries._kg_cached): the
    persisted membership if already built, the probe-free direct
    relation when the subclass question is pre-answered False —
    otherwise the full subClassOf* closure. Every avoided probe is a
    full-scan isEmpty driver action off the caller's critical path
    (guide §1.2 serial term; measured 15 core-s per target_focus call
    on the sf0.1 KG cache)."""
    shared = getattr(triples, "_sx_type_arcs", None)
    if shared is not None:
        return shared
    if getattr(triples, "_sx_has_subclass", None) is False:
        return direct_membership(triples)
    return class_membership(triples)


def class_membership(triples: DataFrame) -> DataFrame:
    """(inst, cls) membership with rdfs:subClassOf* closure — SHACL
    sh:class and targetClass include instances of subclasses
    (exercised by shacl/tests/core/node/class-001.ttl). The subclass
    graph is schema-sized: its transitive closure is a short driver
    loop; when no subclass edges exist (the common transcript-KG case)
    this is exactly the direct rdf:type relation."""
    from .model import RDFS

    direct = (triples.filter((F.col("pred") == RDF_TYPE)
                             & (F.col("obj_kind") == "iri"))
              .select(F.col("subj").alias("inst"),
                      F.col("obj_value").alias("cls"))
              .distinct())
    sub = (triples.filter((F.col("pred") == RDFS + "subClassOf")
                          & (F.col("obj_kind") == "iri"))
           .select(F.col("subj").alias("child"),
                   F.col("obj_value").alias("parent"))
           .distinct())
    if sub.isEmpty():
        return direct
    closure = sub.localCheckpoint(eager=True)
    frontier = closure
    for _ in range(MAX_FIXPOINT_ROUNDS):
        step = (frontier.withColumnRenamed("parent", "mid")
                .join(sub.withColumnRenamed("child", "mid"), on="mid")
                .select("child", "parent"))
        new = step.join(closure, on=["child", "parent"], how="left_anti") \
            .distinct().localCheckpoint(eager=True)
        if new.isEmpty():
            break
        closure = closure.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    inherited = (direct.withColumnRenamed("cls", "child")
                 .join(closure, on="child")
                 .select("inst", F.col("parent").alias("cls")))
    return direct.unionByName(inherited).distinct()


# --------------------------------------------------------------------------
# Engine
# --------------------------------------------------------------------------


class ValidationResult:
    """conformance: (node, shape, conforms); report: REPORT_SCHEMA.

    The report relation is assembled LAZILY (r6, guide §1.2): its
    pieces are hundreds of filter/select constructions — pure driver
    py4j round-trips — and the hot consumers (the bench pipeline,
    every conformance-only registry query) never read it. Building it
    on first access moves that cost off the Amdahl serial term of
    every validation that only consumes conformance."""

    def __init__(self, conformance: DataFrame,
                 report: DataFrame | None = None,
                 report_fn=None):
        self.conformance = conformance
        self._report = report
        self._report_fn = report_fn
        self.conforms: bool | None = None

    @property
    def report(self) -> DataFrame:
        if self._report is None:
            self._report = self._report_fn()
        return self._report

    def finish(self) -> "ValidationResult":
        self.conforms = self.report.limit(1).isEmpty()
        return self


class ValidationEngine:
    """Validate a triples DataFrame against a SchemaDict.

    Usage::
        engine = ValidationEngine(spark, schema, triples)
        result = engine.validate(focus_df)   # focus: (node, shape)
    """

    def __init__(self, spark: SparkSession, schema: SchemaDict,
                 triples: DataFrame, cache: bool = True):
        self.spark = spark
        self.schema = schema
        self.triples = triples
        # cache=False skips candidate/conformance persisting — for
        # micro-graph batch harnesses (ShEx suite) where recomputing a
        # five-row subtree is cheaper than cache bookkeeping.
        self.cache = cache
        self._type_arcs_df: DataFrame | None = None
        self._persisted: list[DataFrame] = []

    @property
    def _type_arcs(self) -> DataFrame:
        """Class-membership relation used by sh:class / targetClass —
        computed lazily on first use (its subClassOf closure costs a
        driver action; schemas without class constraints never pay it),
        then reused across shapes."""
        if self._type_arcs_df is None:
            shared = getattr(self.triples, "_sx_type_arcs", None)
            if shared is not None:
                self._type_arcs_df = shared
                return shared
            if not self._has_subclass:
                # no rdfs:subClassOf arcs: membership IS the direct
                # rdf:type relation — skip class_membership's own
                # isEmpty probe (one full-scan driver action per
                # engine, guide §1.2: every removed action is fixed
                # serial latency off the query)
                self._type_arcs_df = direct_membership(self.triples)
            else:
                self._type_arcs_df = membership_for(self.triples)
            if getattr(self.triples, "_sx_share_derived", False):
                # session-shared KG cache (queries._kg_cached): the
                # membership distinct re-ran its exchange in EVERY
                # class-constrained query of the session — persist it
                # alongside the triple cache; released together with it
                self._type_arcs_df = self._type_arcs_df.persist()
                try:
                    self.triples._sx_type_arcs = self._type_arcs_df
                except Exception:
                    pass
        return self._type_arcs_df

    def _maybe_persist(self, df: DataFrame) -> DataFrame:
        if not self.cache:
            return df
        df = df.persist()
        self._persisted.append(df)
        return df

    @property
    def _big_schema(self) -> bool:
        """Schemas with many shapes / constraints compound candidate
        unions and per-constraint joins into logical plans deep enough
        to overflow Catalyst's recursive TreeNode.clone (observed on
        SHACL-SHACL meta-validation: 18 shapes, 38-constraint
        ShapeShape). For those, sub-plans are flattened behind lazy
        localCheckpoint barriers."""
        n_constraints = sum(len(s.properties) + len(s.node_constraints)
                            for s in self.schema.shapes.values())
        return len(self.schema.shapes) >= 8 or n_constraints >= 24

    def _maybe_flatten(self, df: DataFrame) -> DataFrame:
        """Cut logical-plan depth (lazy localCheckpoint: flattens the
        plan to a LogicalRDD immediately, computes on first action)."""
        if self._big_schema:
            return df.localCheckpoint(eager=False)
        return df

    def unpersist_all(self) -> None:
        """Release every DataFrame this engine persisted (candidate
        sets, per-shape conformance). Call after consuming results in
        long-lived sessions — leftover cached blocks degrade later
        jobs."""
        for df in self._persisted:
            try:
                df.unpersist()
            except Exception:
                pass
        self._persisted.clear()

    def _is_transparent_ref(self, cj: NodeExpr) -> bool:
        """Refs to transparent shapes (hoisted nested sh:property) do
        not report at the outer focus — the nested shape's own results
        surface instead (SHACL sh:property nesting)."""
        return (cj.kind == "ref"
                and self.schema.shapes[cj.label].transparent)

    # -- candidate propagation --------------------------------------------

    def _ref_edges(self) -> list[tuple[str, str, PropertyConstraint | None]]:
        """(shape A, referenced shape B, via-property-or-None)."""
        edges: list[tuple[str, str, PropertyConstraint | None]] = []
        for lbl, sh in self.schema.shapes.items():
            for ne in sh.node_constraints:
                for ref in _collect_refs(ne):
                    edges.append((lbl, ref, None))
            for pc in sh.properties:
                for ref in _collect_refs(pc.node):
                    edges.append((lbl, ref, pc))
            for group in sh.one_of:
                for pc in group:
                    for ref in _collect_refs(pc.node):
                        edges.append((lbl, ref, pc))
            for blk in sh.group_blocks:
                for pc in blk.members:
                    for ref in _collect_refs(pc.node):
                        edges.append((lbl, ref, pc))
            if sh.repeat_alts:
                seen: set[tuple[str, str]] = set()
                for alt in sh.repeat_alts.alts:
                    for pc in alt:
                        for ref in _collect_refs(pc.node):
                            if (pc.path.iri, ref) not in seen:
                                seen.add((pc.path.iri, ref))
                                edges.append((lbl, ref, pc))
        return edges

    def _derive_candidates(self, fa: DataFrame,
                           pc: PropertyConstraint | None) -> DataFrame:
        """Values reachable from candidate set fa via constraint pc's
        path (or fa itself for focus-level refs)."""
        if pc is None:
            return fa.select(KEY, *FCOLS)
        srcs = fa.filter(F.col("f_kind") != "literal") \
                 .select(F.col("f_value").alias("n"))
        # dedup=False: every consumer dropDuplicates([KEY]) right after
        pairs = path_pairs(self.triples, pc.path, srcs, dedup=False)
        return pairs.select(
            F.col("v_kind").alias("f_kind"),
            F.col("v_value").alias("f_value"),
            F.col("v_dt").alias("f_dt"),
            F.col("v_lang").alias("f_lang"),
        ).withColumn(KEY, node_key_col(
            F.col("f_kind"), F.col("f_value"),
            F.col("f_dt"), F.col("f_lang"))).select(KEY, *FCOLS)

    def _propagate_candidates(self, focus: DataFrame) -> dict[str, DataFrame]:
        """cand[S]: every term whose conformance to S is needed —
        the relevant-subgraph reduction (SLang2Clingo.scala:220-228).

        Acyclic schemas (the common case): ONE lazy pass over shapes in
        dependents-first order — no driver actions, no checkpoints; the
        whole propagation folds into the evaluation plan. Recursive
        schemas: semi-naive frontier loop with localCheckpoint."""
        cands: dict[str, DataFrame] = {}
        base = focus_to_candidates(focus)
        for lbl in self.schema.shapes:
            cands[lbl] = base.filter(F.col("shape") == lbl).drop("shape")

        edges = self._ref_edges()
        sccs = self.schema.strata()  # dependencies first
        recursive = any(self.schema.is_recursive(scc) for scc in sccs)

        if not recursive:
            by_src: dict[str, list] = {}
            for a, b, pc in edges:
                by_src.setdefault(a, []).append((b, pc))
            # dependents before dependencies ⇒ reversed strata order
            for scc in reversed(sccs):
                a = scc[0]
                for b, pc in by_src.get(a, []):
                    derived = self._derive_candidates(cands[a], pc)
                    cands[b] = self._maybe_flatten(
                        cands[b].unionByName(derived).dropDuplicates([KEY]))
            return cands

        for lbl in self.schema.shapes:
            cands[lbl] = cands[lbl].localCheckpoint(eager=True)
        frontier = {lbl: cands[lbl] for lbl in self.schema.shapes}
        for _ in range(MAX_FIXPOINT_ROUNDS):
            new_frontier: dict[str, list[DataFrame]] = {}
            for a, b, pc in edges:
                fa = frontier.get(a)
                if fa is None or fa.isEmpty():
                    continue
                derived = self._derive_candidates(fa, pc)
                new = derived.join(cands[b].select(KEY), on=KEY, how="left_anti")
                new_frontier.setdefault(b, []).append(new)
            frontier = {}
            for b, parts in new_frontier.items():
                merged = parts[0]
                for p in parts[1:]:
                    merged = merged.unionByName(p)
                merged = merged.dropDuplicates([KEY]).localCheckpoint(eager=True)
                if not merged.isEmpty():
                    cands[b] = cands[b].unionByName(merged).localCheckpoint(eager=True)
                    frontier[b] = merged
            if not frontier:
                break
        return cands

    # -- shape evaluation ---------------------------------------------------

    def _join_term_bools(self, df: DataFrame, prefix: str,
                         refs: set[str], classes: set[str],
                         conf: dict[str, DataFrame]) -> tuple[DataFrame, dict, dict]:
        """Left-join shape-conformance and class-membership booleans for
        the term columns ``{prefix}kind/value/dt/lang``; returns enriched
        df + column maps."""
        ref_cols: dict[str, Column] = {}
        cls_cols: dict[str, Column] = {}
        if refs or classes:
            key = node_key_col(F.col(prefix + "kind"), F.col(prefix + "value"),
                               F.col(prefix + "dt"), F.col(prefix + "lang"))
            df = df.withColumn("__tkey", key)
        for i, lbl in enumerate(sorted(refs)):
            cname = f"__ref_{i}"
            rhs = conf[lbl].select(F.col(KEY).alias("__tkey"),
                                   F.col("conforms").alias(cname))
            df = df.join(rhs, on="__tkey", how="left")
            ref_cols[lbl] = F.col(cname)
        if classes:
            # class membership is defined on IRI/bnode terms only: a
            # literal whose lexical form equals an instance IRI must
            # not cross-match — NULL join key never equi-joins.
            df = df.withColumn("__jv", F.when(
                F.col(prefix + "kind") != "literal", F.col(prefix + "value")))
        for i, cls in enumerate(sorted(classes)):
            cname = f"__cls_{i}"
            rhs = (self._type_arcs.filter(F.col("cls") == cls)
                   .select(F.col("inst").alias("__jv"), F.lit(True).alias(cname)))
            df = df.join(rhs, on="__jv", how="left")
            cls_cols[cls] = F.col(cname)
        return df, ref_cols, cls_cols

    def _term_cols(self, prefix: str, ref_cols: dict, cls_cols: dict) -> TermCols:
        return TermCols(
            kind=F.col(prefix + "kind"), value=F.col(prefix + "value"),
            dt=F.col(prefix + "dt"), lang=F.col(prefix + "lang"),
            ref_cols=ref_cols, cls_cols=cls_cols,
        )

    def _evaluate_shape(self, shape: Shape, cand: DataFrame,
                        conf: dict[str, DataFrame]
                        ) -> tuple[DataFrame, list[DataFrame]]:
        """Returns (conformance DF keyed by node_key, [report piece DFs]).

        conformance columns: node_key, f_* , conforms.
        """
        reports: list[DataFrame] = []
        sev = F.lit(shape.severity)
        shp = F.lit(shape.label)
        msg = F.lit(shape.message).cast("string")

        if shape.deactivated or (not shape.node_constraints
                                 and not shape.properties
                                 and not shape.one_of
                                 and not shape.group_blocks
                                 and not shape.repeat_alts
                                 and not shape.closed):
            return cand.withColumn("conforms", F.lit(True)), reports

        ok_flags: list[tuple[str, DataFrame]] = []  # (flag column name, keyed DF)
        # flag name → DF that ALREADY carries (KEY, *FCOLS, flag): when a
        # shape has exactly one such flag, it IS the conformance relation
        # and the join-back onto cand is skipped (one exchange + join off
        # the critical path — r6, guide §2.4)
        full_flags: dict[str, DataFrame] = {}
        agg_df: DataFrame | None = None  # fused simple-pred aggregate

        # ---- 1. focus-level node constraints -----------------------------
        self_ok: Column | None = None
        if shape.node_constraints:
            refs: set[str] = set()
            classes: set[str] = set()
            for ne in shape.node_constraints:
                refs |= _collect_refs(ne)
                classes |= _collect_classes(ne)
            df, ref_cols, cls_cols = self._join_term_bools(
                cand, "f_", refs, classes, conf)
            tc = self._term_cols("f_", ref_cols, cls_cols)
            conjuncts: list[tuple[NodeExpr, Column]] = []
            for ne in shape.node_constraints:
                for cj in _top_conjuncts(ne):
                    conjuncts.append((cj, compile_expr(cj, tc)))
            ok_all = conjuncts[0][1]
            for _, c in conjuncts[1:]:
                ok_all = ok_all & c
            node_conf = df.select(KEY, *FCOLS, ok_all.alias("__self_ok"))
            full_flags["__self_ok"] = node_conf
            # report rows per failing conjunct (thunked: report pieces
            # are built only when the report relation is consumed)
            for cj, col in conjuncts:
                comp = COMPONENT_NAMES.get(cj.kind, "NodeConstraintComponent")
                reports.append(
                    lambda df=df, col=col, comp=comp: df.filter(~col).select(
                        F.col("f_value").alias("focus_node"),
                        shp.alias("source_shape"),
                        F.lit(comp).alias("component"),
                        sev.alias("severity"),
                        F.col("f_value").alias("value"),
                        F.lit(None).cast("string").alias("path"),
                        msg.alias("message"),
                    )
                )
            ok_flags.append(("__self_ok", node_conf.select(KEY, "__self_ok")))

        # ---- 2. property constraints --------------------------------------
        simple = [pc for pc in shape.properties if pc.path.is_simple_pred]
        complexp = [pc for pc in shape.properties if not pc.path.is_simple_pred]
        pairwise = [pc for pc in shape.properties
                    if pc.equals or pc.disjoint or pc.less_than
                    or pc.less_than_or_equals]

        if simple or shape.closed:
            agg_df = self._eval_simple_props(shape, cand, conf, simple, reports)
            if (not shape.node_constraints and not complexp
                    and not shape.one_of and not shape.group_blocks
                    and not shape.repeat_alts and not pairwise):
                # pure fused-aggregate shape (the overwhelmingly common
                # case: every constraint is a simple forward predicate):
                # the grouped aggregate already has exactly one row per
                # candidate (the left join preserves every cand row and
                # KEY is unique within cand) and carries the full term
                # columns through the groupBy, so it IS the conformance
                # relation — skip the join-back onto cand (one exchange
                # + sort-merge join per shape on the critical path).
                return (agg_df.select(KEY, *FCOLS,
                                      F.col("__props_ok").alias("conforms")),
                        reports)
            ok_flags.append(("__props_ok", agg_df.select(KEY, "__props_ok")))

        for i, pc in enumerate(complexp):
            flag = f"__cpath_{i}_ok"
            dfp = self._eval_one_property(shape, cand, conf, pc, flag, reports)
            full_flags[flag] = dfp
            ok_flags.append((flag, dfp.select(KEY, flag)))

        # ShEx OneOf: evaluate each group independently (inner reports
        # discarded — the OneOf reports as a whole), then exactly-one.
        if shape.one_of:
            from dataclasses import replace as _dc_replace

            group_flags = []
            for gi, group in enumerate(shape.one_of):
                gname = f"__oneof_{gi}"
                simple_g = [pc for pc in group if pc.path.is_simple_pred]
                complex_g = [pc for pc in group if not pc.path.is_simple_pred]
                # each member family yields a (KEY, bool) relation; the
                # group matches iff ALL members match (EachOf inside the
                # chosen alternative). Non-simple paths (e.g. inverse
                # ^p from ShExC) are evaluated via the complex-path
                # evaluator — dropping them would make a group with a
                # missing ^p arc spuriously 'match'.
                member_flags: list[DataFrame] = []
                if simple_g:
                    proxy = _dc_replace(shape, closed=False, one_of=[],
                                        node_constraints=[],
                                        properties=list(simple_g))
                    sub_reports: list[DataFrame] = []
                    gdf = self._eval_simple_props(
                        proxy, cand, conf, simple_g, sub_reports)
                    member_flags.append(
                        gdf.select(KEY, F.col("__props_ok").alias("__m")))
                for ci, pcx in enumerate(complex_g):
                    sub_reports = []
                    fl = f"__oneof_{gi}_c{ci}"
                    dfp = self._eval_one_property(
                        shape, cand, conf, pcx, fl, sub_reports)
                    member_flags.append(
                        dfp.select(KEY, F.col(fl).alias("__m")))
                gmerged = cand.select(KEY)
                gcol = F.lit(True)
                for mi, mdf in enumerate(member_flags):
                    mdf = mdf.withColumnRenamed("__m", f"__m_{mi}")
                    gmerged = gmerged.join(mdf, on=KEY, how="left")
                    gcol = gcol & F.coalesce(F.col(f"__m_{mi}"), F.lit(False))
                group_flags.append(
                    gmerged.select(KEY, gcol.alias(gname)))
            merged = cand.select(KEY, "f_value")
            total = F.lit(0)
            for gi, gdf in enumerate(group_flags):
                merged = merged.join(gdf, on=KEY, how="left")
                total = total + F.coalesce(
                    F.col(f"__oneof_{gi}"), F.lit(False)).cast("int")
            one_ok = (total == 1)
            reports.append(lambda merged=merged, one_ok=one_ok:
                           merged.filter(~one_ok).select(
                               F.col("f_value").alias("focus_node"),
                               shp.alias("source_shape"),
                               F.lit("OneOfConstraintComponent")
                               .alias("component"),
                               sev.alias("severity"),
                               F.lit(None).cast("string").alias("value"),
                               F.lit(None).cast("string").alias("path"),
                               msg.alias("message"),
                           ))
            ok_flags.append(("__oneof_ok",
                             merged.select(KEY, one_ok.alias("__oneof_ok"))))

        # ShEx group-cardinality blocks ( TC... ){m,n}
        for bi, blk in enumerate(shape.group_blocks):
            flag = f"__grp_{bi}_ok"
            dfg = self._eval_group_block(shape, cand, conf, blk, flag, reports)
            ok_flags.append((flag, dfg))

        # ShEx repeated-predicate partition semantics (RepeatAlts)
        if shape.repeat_alts:
            dfr = self._eval_repeat_alts(shape, cand, conf,
                                         "__repeat_ok", reports)
            ok_flags.append(("__repeat_ok", dfr))

        # pairwise sibling constraints
        for i, pc in enumerate(shape.properties):
            if pc.equals or pc.disjoint or pc.less_than or pc.less_than_or_equals:
                flag = f"__pair_{i}_ok"
                dfp = self._eval_pairwise(shape, cand, pc, flag, reports)
                full_flags[flag] = dfp
                ok_flags.append((flag, dfp.select(KEY, flag)))

        # ---- 3. combine -----------------------------------------------------
        if len(ok_flags) == 1 and ok_flags[0][0] in full_flags:
            # single-flag shape whose flag relation was built FROM cand
            # (one row per candidate, full term columns): it IS the
            # conformance relation — skip the join-back onto cand.
            flag = ok_flags[0][0]
            out = full_flags[flag].select(
                KEY, *FCOLS,
                F.coalesce(F.col(flag), F.lit(True)).alias("conforms"))
            return out, reports
        out = cand
        final_ok = F.lit(True)
        for flag, dfk in ok_flags:
            out = out.join(dfk, on=KEY, how="left")
            final_ok = final_ok & F.coalesce(F.col(flag), F.lit(True))
        out = out.select(KEY, *FCOLS, final_ok.alias("conforms"))
        return out, reports

    # -- fused simple-predicate aggregation --------------------------------

    def _eval_simple_props(self, shape: Shape, cand: DataFrame,
                           conf: dict[str, DataFrame],
                           props: list[PropertyConstraint],
                           reports: list[DataFrame]) -> DataFrame:
        """ONE left join cand ⋈ T(subj) + ONE groupBy with conditional
        aggregates for every simple-pred constraint + CLOSED residue.
        This is the §4.3 physical plan."""
        ts = self._constraint_arcs(shape, props)
        arcs = cand.join(ts, on=cand["f_value"] == ts["subj"], how="left").drop("subj")
        grouped, ok = self._fused_agg(shape, arcs, conf, props, reports,
                                      group_cols=[KEY, *FCOLS])
        return grouped.select(KEY, *FCOLS, ok.alias("__props_ok"))

    def _constraint_arcs(self, shape: Shape,
                         props: list[PropertyConstraint]) -> DataFrame:
        """Pred-filtered arc relation feeding the fused aggregate."""
        t = self.triples
        preds = {pc.path.iri for pc in props}
        if not shape.closed:
            # predicate pushdown: only arcs we actually inspect
            t = t.filter(F.col("pred").isin(list(preds))) if preds else t.limit(0)
        return t.select("subj", "pred", "obj_kind", "obj_value",
                        "obj_dt", "obj_lang")

    def _fused_agg(self, shape: Shape, arcs: DataFrame,
                   conf: dict[str, DataFrame],
                   props: list[PropertyConstraint],
                   reports: list[DataFrame],
                   group_cols: list,
                   extra_aggs: tuple = (),
                   focus_flag: str | None = None) -> tuple[DataFrame, Column]:
        """Shared fused-aggregate builder: conditional aggregates + ok
        expression + report pieces over an arc relation that carries
        f_* focus-term columns and pred/obj_* arc columns. Used by the
        cand-join path (_eval_simple_props) and the one-pass target
        fast path (_eval_shape_onepass). ``focus_flag`` (one-pass):
        column in the grouped relation restricting card-reports to
        focus rows."""
        refs: set[str] = set()
        classes: set[str] = set()
        for pc in props:
            refs |= _collect_refs(pc.node)
            classes |= _collect_classes(pc.node)
        arcs, ref_cols, cls_cols = self._join_term_bools(
            arcs, "obj_", refs, classes, conf)
        tc = self._term_cols("obj_", ref_cols, cls_cols)

        aggs: list[Column] = []
        checks: list[tuple[PropertyConstraint, dict[str, str]]] = []
        report_value_filters: list[tuple[PropertyConstraint, NodeExpr, Column]] = []

        # first pass: per-constraint value predicates (needed up front so
        # qualifiedValueShapesDisjoint constraints can exclude values
        # matching a SIBLING qualified shape — ShEx2Shacl.scala:374-405;
        # fixture core/property/qualifiedValueShapesDisjoint-001.ttl)
        prepared = []
        for pc in props:
            conjs = _top_conjuncts(pc.node)
            per_value = [c for c in conjs if c.kind != "hasValue"]
            existential = [c for c in conjs if c.kind == "hasValue"]
            if per_value:
                v_ok = compile_expr(per_value[0], tc)
                for c in per_value[1:]:
                    v_ok = v_ok & compile_expr(c, tc)
            else:
                v_ok = F.lit(True)
            prepared.append((pc, conjs, existential, v_ok))

        for i, (pc, conjs, existential, v_ok) in enumerate(prepared):
            on_path = F.col("pred") == pc.path.iri
            count_ok = v_ok
            if pc.qualified and pc.qualified_disjoint:
                for j, (pc2, _, _, v_ok2) in enumerate(prepared):
                    if j != i and pc2.qualified and pc2.qualified_disjoint:
                        count_ok = count_ok & ~v_ok2
            names = {
                "total": f"__n_{i}", "ok": f"__ok_{i}", "bad": f"__bad_{i}",
            }
            aggs.append(F.count(F.when(on_path, F.lit(1))).alias(names["total"]))
            aggs.append(F.count(F.when(on_path & count_ok, F.lit(1))).alias(names["ok"]))
            aggs.append(F.count(F.when(on_path & ~v_ok, F.lit(1))).alias(names["bad"]))
            for j, ex in enumerate(existential):
                nm = f"__has_{i}_{j}"
                names[f"has_{j}"] = nm
                hit = _value_match(ex.values[0], tc)
                aggs.append(F.count(F.when(on_path & hit, F.lit(1))).alias(nm))
            if pc.unique_lang:
                nl, ndl = f"__nlang_{i}", f"__ndlang_{i}"
                names["nlang"], names["ndlang"] = nl, ndl
                aggs.append(F.count(F.when(on_path & tc.lang.isNotNull(), F.lit(1))).alias(nl))
                aggs.append(F.countDistinct(
                    F.when(on_path & tc.lang.isNotNull(), F.lower(tc.lang))).alias(ndl))
            checks.append((pc, names))
            # per-value violation report rows (qualified shapes report
            # only their count components, never per-value)
            for cj in conjs:
                if (pc.qualified or cj.kind == "hasValue"
                        or self._is_transparent_ref(cj)):
                    continue
                # filter built inside the report thunk: compile_expr is
                # driver-side py4j work needed only when reports are read
                report_value_filters.append((pc, cj, on_path))

        if shape.closed:
            # allowed = declared property paths + sh:ignoredProperties / EXTRA
            # (SURVEY.md §2.4 CLOSED: per-subject anti-count)
            allowed = shape.declared_preds() | set(shape.ignored)
            off_path = F.col("pred").isNotNull() & ~F.col("pred").isin(list(allowed))
            aggs.append(F.count(F.when(off_path, F.lit(1))).alias("__n_closed_bad"))
            reports.append(
                lambda arcs=arcs, off_path=off_path: arcs.filter(off_path)
                .select(
                    F.col("f_value").alias("focus_node"),
                    F.lit(shape.label).alias("source_shape"),
                    F.lit("ClosedConstraintComponent").alias("component"),
                    F.lit(shape.severity).alias("severity"),
                    F.col("obj_value").alias("value"),
                    F.col("pred").alias("path"),
                    F.lit(shape.message).cast("string").alias("message"),
                )
            )

        # per-value violation reports (before aggregation; thunked)
        for pc, cj, on_path in report_value_filters:
            comp = COMPONENT_NAMES.get(cj.kind, "NodeConstraintComponent")
            reports.append(
                lambda arcs=arcs, cj=cj, on_path=on_path, comp=comp, pc=pc,
                tc=tc:
                arcs.filter(on_path & ~compile_expr(cj, tc)).select(
                    F.col("f_value").alias("focus_node"),
                    F.lit(shape.label).alias("source_shape"),
                    F.lit(comp).alias("component"),
                    F.lit(pc.severity).alias("severity"),
                    F.col("obj_value").alias("value"),
                    F.lit(pc.path.iri).alias("path"),
                    F.lit(pc.message or shape.message).cast("string").alias("message"),
                )
            )

        # group by the full term tuple: KEY is injective in (f_kind,
        # f_value, f_dt, f_lang), so cardinality is unchanged, the
        # exchange still hashes one key set, and the term columns ride
        # through - letting a pure simple-pred shape use this aggregate
        # AS the conformance relation (no join-back onto cand).
        grouped = arcs.groupBy(*group_cols).agg(*aggs, *extra_aggs)

        report_grouped = (grouped.filter(F.col(focus_flag))
                          if focus_flag else grouped)
        ok = F.lit(True)
        if shape.closed:
            ok = ok & (F.col("__n_closed_bad") == 0)
        for pc, names in checks:
            card_base = F.col(names["ok"]) if (pc.qualified or pc.exclusive) \
                else F.col(names["total"])
            c_ok = card_base >= pc.min_count
            if pc.max_count is not None:
                c_ok = c_ok & (card_base <= pc.max_count)
            if not pc.qualified:
                c_ok = c_ok & (F.col(names["bad"]) == 0)
            for j in range(len([k for k in names if k.startswith("has_")])):
                c_ok = c_ok & (F.col(names[f"has_{j}"]) >= 1)
            if pc.unique_lang:
                c_ok = c_ok & (F.col(names["nlang"]) == F.col(names["ndlang"]))
            ok = ok & c_ok
            # cardinality / hasValue / uniqueLang report rows (per focus)
            self._card_reports(reports, report_grouped, shape, pc, names)
        return grouped, ok

    # -- one-pass target fast path -----------------------------------------

    _FAST_TARGET_KINDS = frozenset(
        {"targetSubjectsOf", "targetObjectsOf", "targetClass"})

    def _fast_target_eligible(self, shape: Shape) -> bool:
        """True when the shape's conformance can be computed in ONE
        grouped pass over pred-filtered arcs + target-marker rows —
        no focus distinct, no cand ⋈ arcs join (guide §2.4 'remove
        shuffles outright'). Requires: every target derivable from a
        predicate filter, and every constraint in the fused simple-pred
        aggregate family. Refs are excluded by the caller (ref-free
        schemas only)."""
        return (self._fast_target_base(shape)
                and all(pc.path.is_simple_pred
                        and not (pc.equals or pc.disjoint or pc.less_than
                                 or pc.less_than_or_equals)
                        for pc in shape.properties))

    def _fast_target_base(self, shape: Shape) -> bool:
        # closed shapes are EXCLUDED (r6): their constraint-arc relation
        # is the UNFILTERED graph, and the one-pass union would shuffle
        # every arc of every subject instead of only the focus set's —
        # the cand-join path's left join restricts to candidates first,
        # which is the 100-TB-safe shape for sh:closed.
        return (bool(shape.targets)
                and all(t.kind in self._FAST_TARGET_KINDS
                        for t in shape.targets)
                and not shape.deactivated and not shape.closed
                and not shape.node_constraints and not shape.one_of
                and not shape.group_blocks and not shape.repeat_alts)

    def _fast_target_cpath_eligible(self, shape: Shape) -> bool:
        """One-pass eligibility for a single COMPLEX-path shape
        (sequence / inverse / alternative / closure paths): same target
        conditions as the simple fast path, exactly one plain property
        whose path is not a simple predicate."""
        if not (self._fast_target_base(shape)
                and len(shape.properties) == 1):
            return False
        pc = shape.properties[0]
        return (not pc.path.is_simple_pred
                and not (pc.equals or pc.disjoint or pc.less_than
                         or pc.less_than_or_equals))

    @property
    def _has_subclass(self) -> bool:
        """Does the graph carry any rdfs:subClassOf arc? Decides
        whether a targetClass marker can use the raw rdf:type filter
        (the common case) or must go through the subClassOf* closure.
        One limit(1) probe, memoized per engine — the same scan
        class_membership pays on first use."""
        if getattr(self, "_has_subclass_memo", None) is None:
            # cross-engine memo rides on the (session-cached) triples
            # DataFrame object: every kg_* registry query builds a new
            # engine over the SAME cached relation, and each probe is a
            # full-scan driver action (guide §1.2 serial term)
            shared = getattr(self.triples, "_sx_has_subclass", None)
            if shared is not None:
                self._has_subclass_memo = shared
                return shared
            from .model import RDFS

            self._has_subclass_memo = not self.triples.filter(
                (F.col("pred") == RDFS + "subClassOf")
                & (F.col("obj_kind") == "iri")).limit(1).isEmpty()
            try:
                self.triples._sx_has_subclass = self._has_subclass_memo
            except Exception:
                pass
        return self._has_subclass_memo

    def _target_markers(self, shape: Shape,
                        targets: list | None = None) -> DataFrame:
        """Focus-term marker rows (f_kind, f_value, f_dt, f_lang) for
        the one-pass fast path — one pred-filter projection per target,
        NOT deduplicated (the grouped max-flag dedupes for free)."""
        t = self.triples
        null_s = F.lit(None).cast("string")

        def _subj_rows(sel: DataFrame, col: str) -> DataFrame:
            c = F.col(col)
            kind = F.when(c.startswith("_:"), F.lit("bnode")) \
                .otherwise(F.lit("iri"))
            return sel.select(kind.alias("f_kind"), c.alias("f_value"),
                              null_s.alias("f_dt"), null_s.alias("f_lang"))

        pieces: list[DataFrame] = []
        for tgt in (shape.targets if targets is None else targets):
            if tgt.kind == "targetSubjectsOf":
                pieces.append(_subj_rows(
                    t.filter(F.col("pred") == tgt.value), "subj"))
            elif tgt.kind == "targetClass":
                if self._has_subclass:
                    pieces.append(_subj_rows(
                        self._type_arcs.filter(F.col("cls") == tgt.value),
                        "inst"))
                else:
                    pieces.append(_subj_rows(
                        t.filter((F.col("pred") == RDF_TYPE)
                                 & (F.col("obj_kind") == "iri")
                                 & (F.col("obj_value") == tgt.value)),
                        "subj"))
            else:  # targetObjectsOf — objects may be full literal terms
                pieces.append(
                    t.filter(F.col("pred") == tgt.value)
                    .select(F.col("obj_kind").alias("f_kind"),
                            F.col("obj_value").alias("f_value"),
                            F.col("obj_dt").alias("f_dt"),
                            F.col("obj_lang").alias("f_lang")))
        out = pieces[0]
        for p in pieces[1:]:
            out = out.unionByName(p)
        return out

    def _eval_shape_onepass(self, shape: Shape,
                            conf: dict[str, DataFrame]
                            ) -> tuple[DataFrame, list[DataFrame]]:
        """Conformance for a _fast_target_eligible shape in ONE grouped
        pass: union(pred-filtered constraint arcs keyed by subject,
        target marker rows keyed by focus term) → one groupBy(term) →
        filter(is-focus). Replaces [target scan + focus distinct +
        cand ⋈ arcs join + groupBy] with [scan-union + groupBy]: at any
        scale this removes two shuffles of data-sized relations and the
        join; the aggregate/report semantics are byte-identical to the
        cand-join path (same _fused_agg)."""
        reports: list[DataFrame] = []
        props = list(shape.properties)
        preds = {pc.path.iri for pc in props}
        null_s = F.lit(None).cast("string")
        subj_kind = F.when(F.col("subj").startswith("_:"), F.lit("bnode")) \
            .otherwise(F.lit("iri"))
        # Subject-keyed targets (targetSubjectsOf; targetClass when the
        # graph has no subClassOf arcs) group by the SAME term as the
        # constraint arcs — their marker condition folds into the arc
        # scan as a flag on the row itself instead of a second full
        # scan unioned in (r6, guide §2.4: the one-pass union read the
        # cached triple relation twice per shape; a row that is both
        # marker and arc — e.g. a target predicate that is also
        # constrained — counts once and flags once, exactly what the
        # two-row union aggregated to). Term-keyed targets
        # (targetObjectsOf, subclass-closed targetClass) still union
        # marker rows keyed by their own term.
        subj_conds: list[Column] = []
        term_targets: list = []
        for tgt in shape.targets:
            if tgt.kind == "targetSubjectsOf":
                subj_conds.append(F.col("pred") == tgt.value)
            elif tgt.kind == "targetClass" and not self._has_subclass:
                subj_conds.append((F.col("pred") == RDF_TYPE)
                                  & (F.col("obj_kind") == "iri")
                                  & (F.col("obj_value") == tgt.value))
            else:
                term_targets.append(tgt)
        marker_cond = None
        for c in subj_conds:
            marker_cond = c if marker_cond is None else (marker_cond | c)
        arc_cond = F.col("pred").isin(list(preds)) if preds else F.lit(False)
        scan_cond = arc_cond if marker_cond is None \
            else (arc_cond | marker_cond)
        arcs = self.triples.filter(scan_cond).select(
            subj_kind.alias("f_kind"), F.col("subj").alias("f_value"),
            null_s.alias("f_dt"), null_s.alias("f_lang"),
            "pred", "obj_kind", "obj_value", "obj_dt", "obj_lang",
            (F.lit(False) if marker_cond is None else marker_cond)
            .alias("__tgt"))
        if term_targets:
            markers = self._target_markers(shape, term_targets).select(
                "f_kind", "f_value", "f_dt", "f_lang",
                null_s.alias("pred"), null_s.alias("obj_kind"),
                null_s.alias("obj_value"), null_s.alias("obj_dt"),
                null_s.alias("obj_lang"), F.lit(True).alias("__tgt"))
            arcs = arcs.unionByName(markers)
        arcs = arcs.withColumn(
            KEY, node_key_col(F.col("f_kind"), F.col("f_value"),
                              F.col("f_dt"), F.col("f_lang")))
        grouped, ok = self._fused_agg(
            shape, arcs, conf, props, reports,
            group_cols=[KEY, *FCOLS],
            extra_aggs=(F.max("__tgt").alias("__is_focus"),),
            focus_flag="__is_focus")
        out = grouped.filter(F.col("__is_focus")) \
            .select(KEY, *FCOLS, ok.alias("conforms"))
        return out, reports

    def _eval_shape_onepass_cpath(self, shape: Shape,
                                  conf: dict[str, DataFrame]
                                  ) -> tuple[DataFrame, list[DataFrame]]:
        """One-pass conformance for a single complex-path shape
        (_fast_target_cpath_eligible): union(per-pair value-checked
        rows keyed by source node, target-marker rows) → ONE
        groupBy(term) → filter(is-focus). Replaces the generic path's
        [target-union distinct + candidate distinct + persist +
        groupBy(src) + cand ⋈ agg join-back (2 exchanges + SMJ)] with
        [path pairs + one union-groupBy] (guide §2.4 — the same trick
        _eval_shape_onepass plays for fused simple predicates). The
        path computation itself keeps the focus semi-join restriction
        (path_pairs srcs), so at scale the chain still only expands the
        focus neighborhood. Aggregate semantics are identical to
        _eval_one_property: zero-pair focus nodes group from their
        marker row alone and count 0."""
        reports: list[DataFrame] = []
        pc = shape.properties[0]
        markers = self._target_markers(shape)
        srcs = markers.filter(F.col("f_kind") != "literal") \
            .select(F.col("f_value").alias("n"))
        dedup_free = pc.min_count <= 1 and pc.max_count is None
        pairs = path_pairs(self.triples, pc.path, srcs,
                           dedup=not dedup_free)
        refs = _collect_refs(pc.node)
        classes = _collect_classes(pc.node)
        pairs, ref_cols, cls_cols = self._join_term_bools(
            pairs, "v_", refs, classes, conf)
        tc = self._term_cols("v_", ref_cols, cls_cols)
        report_pairs = (pairs.dropDuplicates(["src", "v_kind", "v_value",
                                              "v_dt", "v_lang"])
                        if dedup_free else pairs)
        conjs = _top_conjuncts(pc.node)
        per_value = [c for c in conjs if c.kind != "hasValue"]
        existential = [c for c in conjs if c.kind == "hasValue"]
        v_ok = F.lit(True)
        for c in per_value:
            v_ok = v_ok & compile_expr(c, tc)
        for cj in per_value:
            if (pc.qualified or cj.kind == "true"
                    or self._is_transparent_ref(cj)):
                continue
            comp = COMPONENT_NAMES.get(cj.kind, "NodeConstraintComponent")
            reports.append(
                lambda cj=cj, comp=comp, report_pairs=report_pairs, tc=tc,
                pc=pc: report_pairs.filter(~compile_expr(cj, tc)).select(
                    F.col("src").alias("focus_node"),
                    F.lit(shape.label).alias("source_shape"),
                    F.lit(comp).alias("component"),
                    F.lit(pc.severity).alias("severity"),
                    F.col("v_value").alias("value"),
                    F.lit(pc.path.describe()).alias("path"),
                    F.lit(pc.message or shape.message).cast("string")
                    .alias("message"),
                ))
        null_s = F.lit(None).cast("string")
        null_b = F.lit(None).cast("boolean")
        src_kind = F.when(F.col("src").startswith("_:"), F.lit("bnode")) \
            .otherwise(F.lit("iri"))
        hit_names = [f"__hit_{j}" for j in range(len(existential))]
        pair_rows = pairs.select(
            src_kind.alias("f_kind"), F.col("src").alias("f_value"),
            null_s.alias("f_dt"), null_s.alias("f_lang"),
            v_ok.alias("__vok"),
            *[_value_match(ex.values[0], tc).alias(nm)
              for nm, ex in zip(hit_names, existential)],
            F.lit(False).alias("__tgt"))
        marker_rows = markers.select(
            "f_kind", "f_value", "f_dt", "f_lang",
            null_b.alias("__vok"),
            *[null_b.alias(nm) for nm in hit_names],
            F.lit(True).alias("__tgt"))
        un = pair_rows.unionByName(marker_rows).withColumn(
            KEY, node_key_col(F.col("f_kind"), F.col("f_value"),
                              F.col("f_dt"), F.col("f_lang")))
        is_pair = ~F.col("__tgt")
        aggs = [
            F.count(F.when(is_pair, F.lit(1))).alias("__n"),
            F.count(F.when(is_pair & F.col("__vok"), F.lit(1)))
            .alias("__ok_n"),
            F.count(F.when(is_pair & ~F.col("__vok"), F.lit(1)))
            .alias("__bad_n"),
            F.max("__tgt").alias("__is_focus"),
        ]
        for nm in hit_names:
            aggs.append(F.count(F.when(is_pair & F.col(nm), F.lit(1)))
                        .alias(nm.replace("__hit_", "__has_")))
        grouped = un.groupBy(KEY, *FCOLS).agg(*aggs)
        focus_g = grouped.filter(F.col("__is_focus"))
        card = F.col("__ok_n") if (pc.qualified or pc.exclusive) \
            else F.col("__n")
        ok = card >= pc.min_count
        if pc.max_count is not None:
            ok = ok & (card <= pc.max_count)
        if not pc.qualified:
            ok = ok & (F.col("__bad_n") == 0)
        for j in range(len(existential)):
            ok = ok & (F.col(f"__has_{j}") >= 1)
        names = {"total": "__n", "ok": "__ok_n", "bad": "__bad_n"}
        for j in range(len(existential)):
            names[f"has_{j}"] = f"__has_{j}"
        self._card_reports(reports, focus_g, shape, pc, names)
        out = focus_g.select(KEY, *FCOLS, ok.alias("conforms"))
        return out, reports

    def _card_reports(self, reports: list, grouped: DataFrame,
                      shape: Shape, pc: PropertyConstraint, names: dict) -> None:
        """Appends report THUNKS (piece construction deferred to the
        lazy report assembly)."""
        def base_cols(comp, flt_fn):
            return lambda: grouped.filter(flt_fn()).select(
                F.col("f_value").alias("focus_node"),
                F.lit(shape.label).alias("source_shape"),
                F.lit(comp).alias("component"),
                F.lit(pc.severity).alias("severity"),
                F.lit(None).cast("string").alias("value"),
                F.lit(pc.path.describe()).alias("path"),
                F.lit(pc.message or shape.message).cast("string")
                .alias("message"),
            )

        def card():
            return F.col(names["ok"]) if (pc.qualified or pc.exclusive) \
                else F.col(names["total"])
        if pc.min_count > 0:
            comp = ("QualifiedMinCountConstraintComponent" if pc.qualified
                    else "MinCountConstraintComponent")
            reports.append(base_cols(comp, lambda: card() < pc.min_count))
        if pc.max_count is not None:
            comp = ("QualifiedMaxCountConstraintComponent" if pc.qualified
                    else "MaxCountConstraintComponent")
            reports.append(base_cols(comp, lambda: card() > pc.max_count))
        for j in range(len([k for k in names if k.startswith("has_")])):
            reports.append(base_cols(
                "HasValueConstraintComponent",
                lambda j=j: F.col(names[f"has_{j}"]) < 1))
        if pc.unique_lang:
            reports.append(base_cols(
                "UniqueLangConstraintComponent",
                lambda: F.col(names["nlang"]) != F.col(names["ndlang"])))

    # -- group-cardinality blocks ----------------------------------------------

    def _eval_group_block(self, shape: Shape, cand: DataFrame,
                          conf: dict[str, DataFrame], blk,
                          flag: str, reports: list[DataFrame]) -> DataFrame:
        """( TC... ){m,n} — one left join on the block's predicates +
        one grouped conditional aggregate (same physical shape as the
        fused simple-pred plan). Repetition count k:
          eachOf: every member consumes one arc per repetition ⇒ all
                  members' matching counts must be EQUAL (= k);
          oneOf:  each repetition consumes one arc of any member ⇒
                  k = sum of matching counts.
        Conformance: min ≤ k ≤ max and no non-matching arcs on member
        predicates (two-count semantics). shexTest 'skipped' (card `?`,
        zero arcs) passes through min=0, not a special case."""
        preds = [pc.path.iri for pc in blk.members]
        ts = (self.triples.filter(F.col("pred").isin(preds))
              .select("subj", "pred", "obj_kind", "obj_value",
                      "obj_dt", "obj_lang"))
        arcs = cand.join(ts, on=cand["f_value"] == ts["subj"], how="left") \
                   .drop("subj")
        refs: set[str] = set()
        classes: set[str] = set()
        for pc in blk.members:
            refs |= _collect_refs(pc.node)
            classes |= _collect_classes(pc.node)
        arcs, ref_cols, cls_cols = self._join_term_bools(
            arcs, "obj_", refs, classes, conf)
        tc = self._term_cols("obj_", ref_cols, cls_cols)

        aggs: list[Column] = []
        for i, pc in enumerate(blk.members):
            on_path = F.col("pred") == pc.path.iri
            v_ok = compile_expr(pc.node, tc)
            aggs.append(F.count(F.when(on_path & v_ok, F.lit(1)))
                        .alias(f"__gok_{i}"))
            aggs.append(F.count(F.when(on_path & ~v_ok, F.lit(1)))
                        .alias(f"__gbad_{i}"))
        grouped = arcs.groupBy(KEY, "f_value").agg(*aggs)

        bad = F.lit(0)
        for i in range(len(blk.members)):
            bad = bad + F.col(f"__gbad_{i}")
        oks = [F.col(f"__gok_{i}") for i in range(len(blk.members))]
        if blk.kind == "oneOf":
            k = oks[0]
            for c in oks[1:]:
                k = k + c
            counts_consistent = F.lit(True)
        else:  # eachOf: all member counts equal
            k = oks[0]
            counts_consistent = F.lit(True)
            for c in oks[1:]:
                counts_consistent = counts_consistent & (c == k)
        in_range = k >= blk.min_count
        if blk.max_count is not None:
            in_range = in_range & (k <= blk.max_count)
        ok = (bad == 0) & counts_consistent & in_range
        reports.append(lambda grouped=grouped, ok=ok: grouped.filter(~ok).select(
            F.col("f_value").alias("focus_node"),
            F.lit(shape.label).alias("source_shape"),
            F.lit("GroupCardinalityConstraintComponent").alias("component"),
            F.lit(shape.severity).alias("severity"),
            F.lit(None).cast("string").alias("value"),
            F.lit("|".join(preds)).alias("path"),
            F.lit(shape.message).cast("string").alias("message"),
        ))
        return grouped.select(KEY, ok.alias(flag))

    # -- repeated-predicate partition (RepeatAlts) -------------------------

    def _eval_repeat_alts(self, shape: Shape, cand: DataFrame,
                          conf: dict[str, DataFrame],
                          flag: str, reports: list[DataFrame]) -> DataFrame:
        """ShEx partition semantics for repeated predicates: the focus
        node's arcs over the mentioned predicates must be partitioned
        among the triple constraints of SOME OneOf alternative, each TC
        consuming a count within [min,max] (suite: PstarT / P2T2 /
        nPlus1 / false-lead-excluding-value-shape families).

        Physical shape: ONE left join on the mentioned predicates + ONE
        grouped conditional aggregate — identical to the fused
        simple-pred plan, so it scales the same way. Feasibility per
        (alternative, predicate) is a transportation problem decided by
        the Gale–Hoffman subset conditions over arc classes:

          * none  = arcs satisfying NO member TC ⇒ must be 0 (every
            matchable arc is consumed; the predicate is mentioned);
          * for every nonempty subset S of the ≤ MAX_REPEAT_TCS member
            TCs: arcs satisfying ONLY TCs in S must fit under
            Σ max(S) (skipped when S has an unbounded member), and
            Σ min(S) must be coverable by arcs satisfying ANY TC in S.

        These conditions are necessary and sufficient for an exact
        partition (bipartite flow integrality), so this is the
        declarative/exhaustive reading of the spec — not the greedy
        strategy (trait:Greedy suite entries that encode greedy-only
        failures stay skipped)."""
        ra = shape.repeat_alts
        preds = list(ra.mentioned)
        ts = (self.triples.filter(F.col("pred").isin(preds))
              .select("subj", "pred", "obj_kind", "obj_value",
                      "obj_dt", "obj_lang"))
        arcs = cand.join(ts, on=cand["f_value"] == ts["subj"],
                         how="left").drop("subj")
        refs: set[str] = set()
        classes: set[str] = set()
        for alt in ra.alts:
            for pc in alt:
                refs |= _collect_refs(pc.node)
                classes |= _collect_classes(pc.node)
        arcs, ref_cols, cls_cols = self._join_term_bools(
            arcs, "obj_", refs, classes, conf)
        tc = self._term_cols("obj_", ref_cols, cls_cols)

        aggs: list[Column] = []
        for p_i, p in enumerate(preds):
            aggs.append(F.count(F.when(F.col("pred") == p, F.lit(1)))
                        .alias(f"__rp_n_{p_i}"))
        alt_by_pred: list[dict[str, list]] = []
        for j, alt in enumerate(ra.alts):
            by_pred: dict[str, list] = {}
            for pc in alt:
                by_pred.setdefault(pc.path.iri, []).append(pc)
            alt_by_pred.append(by_pred)
            for p, tcs in by_pred.items():
                p_i = preds.index(p)
                on_p = F.col("pred") == p
                # NULL-safe per-arc member satisfaction (a missed conf
                # join must read False, not NULL — a NULL leaking into
                # ~any_match would silently drop the arc from `none`)
                v_oks = [F.coalesce(compile_expr(pc.node, tc), F.lit(False))
                         for pc in tcs]
                any_match = v_oks[0]
                for v in v_oks[1:]:
                    any_match = any_match | v
                aggs.append(F.count(F.when(on_p & ~any_match, F.lit(1)))
                            .alias(f"__ra_{j}_{p_i}_none"))
                k = len(tcs)
                for s in range(1, 1 << k):
                    in_s = F.lit(False)
                    out_s = F.lit(False)
                    for b in range(k):
                        if s & (1 << b):
                            in_s = in_s | v_oks[b]
                        else:
                            out_s = out_s | v_oks[b]
                    aggs.append(
                        F.count(F.when(on_p & in_s, F.lit(1)))
                        .alias(f"__ra_{j}_{p_i}_reach_{s}"))
                    aggs.append(
                        F.count(F.when(on_p & any_match & ~out_s, F.lit(1)))
                        .alias(f"__ra_{j}_{p_i}_only_{s}"))

        grouped = arcs.groupBy(KEY, "f_value").agg(*aggs)

        feasible_any = F.lit(False)
        for j, by_pred in enumerate(alt_by_pred):
            cond = F.lit(True)
            for p_i, p in enumerate(preds):
                tcs = by_pred.get(p)
                if not tcs:
                    # alternative has no slot for this mentioned pred:
                    # any arc on it is an unmatched matchable
                    cond = cond & (F.col(f"__rp_n_{p_i}") == 0)
                    continue
                cond = cond & (F.col(f"__ra_{j}_{p_i}_none") == 0)
                k = len(tcs)
                for s in range(1, 1 << k):
                    members = [tcs[b] for b in range(k) if s & (1 << b)]
                    if all(pc.max_count is not None for pc in members):
                        cap = sum(pc.max_count for pc in members)
                        cond = cond & (
                            F.col(f"__ra_{j}_{p_i}_only_{s}") <= cap)
                    need = sum(pc.min_count for pc in members)
                    if need > 0:
                        cond = cond & (
                            F.col(f"__ra_{j}_{p_i}_reach_{s}") >= need)
            feasible_any = feasible_any | cond

        reports.append(lambda grouped=grouped, feasible_any=feasible_any:
                       grouped.filter(~feasible_any).select(
            F.col("f_value").alias("focus_node"),
            F.lit(shape.label).alias("source_shape"),
            F.lit("PartitionConstraintComponent").alias("component"),
            F.lit(shape.severity).alias("severity"),
            F.lit(None).cast("string").alias("value"),
            F.lit("|".join(preds)).alias("path"),
            F.lit(shape.message).cast("string").alias("message"),
        ))
        return grouped.select(KEY, feasible_any.alias(flag))

    # -- complex-path property ------------------------------------------------

    def _eval_one_property(self, shape: Shape, cand: DataFrame,
                           conf: dict[str, DataFrame], pc: PropertyConstraint,
                           flag: str, reports: list[DataFrame]) -> DataFrame:
        srcs = cand.filter(F.col("f_kind") != "literal") \
                   .select(F.col("f_value").alias("n"))
        # Multiplicity-insensitive thresholds (minCount ≤ 1, no
        # maxCount: the aggregate only tests exists / none) let the
        # aggregate run on NON-deduped pairs — one exchange less on the
        # critical path (r6, guide §2.4). Reports keep set semantics
        # via an explicit dedup on their own (lazy) branch.
        dedup_free = pc.min_count <= 1 and pc.max_count is None
        pairs = path_pairs(self.triples, pc.path, srcs,
                           dedup=not dedup_free)
        refs = _collect_refs(pc.node)
        classes = _collect_classes(pc.node)
        pairs, ref_cols, cls_cols = self._join_term_bools(
            pairs, "v_", refs, classes, conf)
        tc = self._term_cols("v_", ref_cols, cls_cols)
        report_pairs = (pairs.dropDuplicates(["src", "v_kind", "v_value",
                                              "v_dt", "v_lang"])
                        if dedup_free else pairs)
        conjs = _top_conjuncts(pc.node)
        per_value = [c for c in conjs if c.kind != "hasValue"]
        existential = [c for c in conjs if c.kind == "hasValue"]
        v_ok = F.lit(True)
        for c in per_value:
            v_ok = v_ok & compile_expr(c, tc)
        for cj in per_value:
            if (pc.qualified or cj.kind == "true"
                    or self._is_transparent_ref(cj)):
                continue
            comp = COMPONENT_NAMES.get(cj.kind, "NodeConstraintComponent")
            reports.append(
                lambda cj=cj, comp=comp, report_pairs=report_pairs, tc=tc,
                pc=pc: report_pairs.filter(~compile_expr(cj, tc)).select(
                    F.col("src").alias("focus_node"),
                    F.lit(shape.label).alias("source_shape"),
                    F.lit(comp).alias("component"),
                    F.lit(pc.severity).alias("severity"),
                    F.col("v_value").alias("value"),
                    F.lit(pc.path.describe()).alias("path"),
                    F.lit(pc.message or shape.message).cast("string")
                    .alias("message"),
                ))
        aggs = [
            F.count(F.lit(1)).alias("__n"),
            F.count(F.when(v_ok, F.lit(1))).alias("__ok_n"),
            F.count(F.when(~v_ok, F.lit(1))).alias("__bad_n"),
        ]
        for j, ex in enumerate(existential):
            aggs.append(F.count(F.when(_value_match(ex.values[0], tc), F.lit(1)))
                        .alias(f"__has_{j}"))
        g = pairs.groupBy("src").agg(*aggs)
        # LEFT join from candidates so zero-value nodes count 0
        joined = cand.join(g, on=cand["f_value"] == g["src"], how="left").drop("src")
        card = F.coalesce(
            F.col("__ok_n") if (pc.qualified or pc.exclusive) else F.col("__n"),
            F.lit(0))
        ok = card >= pc.min_count
        if pc.max_count is not None:
            ok = ok & (card <= pc.max_count)
        if not pc.qualified:
            ok = ok & (F.coalesce(F.col("__bad_n"), F.lit(0)) == 0)
        for j in range(len(existential)):
            ok = ok & (F.coalesce(F.col(f"__has_{j}"), F.lit(0)) >= 1)
        # cardinality + hasValue reports (hasValue over a complex path:
        # zero-pair focus nodes coalesce to count 0 and must report —
        # W3C path-complex-001 targets nodes absent from the data)
        names = {"total": "__n", "ok": "__ok_n", "bad": "__bad_n"}
        has_cols = []
        for j in range(len(existential)):
            names[f"has_{j}"] = f"__has_{j}"
            has_cols.append(
                F.coalesce(F.col(f"__has_{j}"), F.lit(0)).alias(f"__has_{j}"))
        grouped_for_reports = joined.select(
            KEY, "f_value",
            F.coalesce(F.col("__n"), F.lit(0)).alias("__n"),
            F.coalesce(F.col("__ok_n"), F.lit(0)).alias("__ok_n"),
            F.coalesce(F.col("__bad_n"), F.lit(0)).alias("__bad_n"),
            *has_cols,
        )
        self._card_reports(reports, grouped_for_reports, shape, pc, names)
        return joined.select(KEY, *FCOLS, ok.alias(flag))

    # -- pairwise sibling-path constraints ------------------------------------

    def _eval_pairwise(self, shape: Shape, cand: DataFrame,
                       pc: PropertyConstraint, flag: str,
                       reports: list[DataFrame]) -> DataFrame:
        """equals / disjoint / lessThan(-OrEquals) against a sibling
        predicate: per-focus set joins (SURVEY.md §2.5 rows)."""
        srcs = cand.filter(F.col("f_kind") != "literal") \
                   .select(F.col("f_value").alias("n"))
        a = path_pairs(self.triples, pc.path, srcs).withColumn(
            "akey", node_key_col(F.col("v_kind"), F.col("v_value"),
                                 F.col("v_dt"), F.col("v_lang")))
        sibling = pc.equals or pc.disjoint or pc.less_than or pc.less_than_or_equals
        b = pred_pairs_for(self.triples, sibling, srcs).withColumn(
            "bkey", node_key_col(F.col("v_kind"), F.col("v_value"),
                                 F.col("v_dt"), F.col("v_lang")))
        if pc.equals:
            comp_name = "EqualsConstraintComponent"
            lhs = a.select(F.col("src"), F.col("akey").alias("k"),
                           F.col("v_value").alias("av"))
            rhs = b.select(F.col("src"), F.col("bkey").alias("k"),
                           F.col("v_value").alias("bv"))
            full = lhs.join(rhs, on=["src", "k"], how="full_outer")
            viol = full.filter(F.col("av").isNull() | F.col("bv").isNull())
            viol_vals = viol.select(
                "src", F.coalesce(F.col("av"), F.col("bv")).alias("value"))
        elif pc.disjoint:
            comp_name = "DisjointConstraintComponent"
            viol_vals = a.select("src", F.col("akey").alias("k"),
                                 F.col("v_value").alias("value")) \
                .join(b.select("src", F.col("bkey").alias("k")), on=["src", "k"]) \
                .select("src", "value")
        else:
            comp_name = ("LessThanConstraintComponent" if pc.less_than
                         else "LessThanOrEqualsConstraintComponent")
            theta = a.alias("A").join(b.alias("B"), on="src")
            avc = F.when(F.col("A.v_dt").isin(list(TEMPORAL_DATATYPES)),
                         F.col("A.v_value").try_cast("timestamp").cast("double")
                         ).otherwise(F.col("A.v_value").try_cast("double"))
            bvc = F.when(F.col("B.v_dt").isin(list(TEMPORAL_DATATYPES)),
                         F.col("B.v_value").try_cast("timestamp").cast("double")
                         ).otherwise(F.col("B.v_value").try_cast("double"))
            good = (avc < bvc) if pc.less_than else (avc <= bvc)
            viol_vals = theta.filter(
                ~F.coalesce(good, F.lit(False))
            ).select("src", F.col("A.v_value").alias("value"))
        reports.append(lambda viol_vals=viol_vals, comp_name=comp_name:
                       viol_vals.select(
            F.col("src").alias("focus_node"),
            F.lit(shape.label).alias("source_shape"),
            F.lit(comp_name).alias("component"),
            F.lit(pc.severity).alias("severity"),
            F.col("value"),
            F.lit(pc.path.describe()).alias("path"),
            F.lit(pc.message or shape.message).cast("string").alias("message"),
        ))
        bad_srcs = viol_vals.select("src").distinct().withColumn("__pair_bad", F.lit(True))
        joined = cand.join(bad_srcs, on=cand["f_value"] == bad_srcs["src"], how="left")
        return joined.select(
            KEY, *FCOLS,
            (~F.coalesce(F.col("__pair_bad"), F.lit(False))).alias(flag))

    # -- public entry ---------------------------------------------------------

    def _run_fixpoint(self, scc: list[str], cands: dict, conf: dict,
                      start: bool) -> dict[str, list[DataFrame]]:
        """Iterate a recursive SCC to a fixpoint from the given start
        value, mutating conf[lbl] for the SCC's labels in place.
        start=True  → GREATEST fixpoint (co-inductive, Unknown-as-ok —
                      ShapesMap.scala:19-23);
        start=False → LEAST fixpoint (inductive). Where the two
        disagree, the pair's status is genuinely Unknown (Val.scala's
        4-valued lattice: decided only by the starting assumption).
        Returns the final round's report pieces per label."""
        for lbl in scc:
            conf[lbl] = cands[lbl].withColumn("conforms", F.lit(start)) \
                                  .localCheckpoint(eager=True)
        # Convergence detection by per-label conforms COUNTS is sound
        # only because negated reference cycles are rejected up front
        # (SchemaDict.check_well_formed): within an SCC every operator
        # is then monotone, so each label's conforming set shrinks
        # (greatest fixpoint) or grows (least) monotonically between
        # rounds — equal cardinality implies an equal set, never an
        # equal-sized swap.
        prev_counts = {lbl: conf[lbl].filter("conforms").count() for lbl in scc}
        last_reports: dict[str, list[DataFrame]] = {}
        for _ in range(MAX_FIXPOINT_ROUNDS):
            changed = False
            for lbl in scc:
                c, reps = self._evaluate_shape(
                    self.schema.shapes[lbl], cands[lbl], conf)
                c = c.localCheckpoint(eager=True)
                n = c.filter("conforms").count()
                last_reports[lbl] = reps
                conf[lbl] = c
                if n != prev_counts[lbl]:
                    prev_counts[lbl] = n
                    changed = True
            if not changed:
                break
        return last_reports

    def validate(self, focus: DataFrame,
                 full_terms: bool = False,
                 with_status: bool = False,
                 targets_native: bool = False) -> ValidationResult:
        """full_terms=True adds node_kind/node_dt/node_lang columns to
        the conformance relation — needed when literal focus terms can
        share a lexical value but differ in datatype/language (the ShEx
        suite's "ab"^^dt1 vs "ab"^^dt2 entries).

        with_status=True adds a 4-valued ``status`` column
        (conformant | nonconformant | unknown — Val.scala:3-45): for
        recursive SCCs the engine then ALSO runs the least fixpoint,
        and pairs whose verdict differs between the greatest and least
        fixpoints (i.e. decided only by the co-inductive starting
        assumption) surface as 'unknown' instead of silently adopting
        the co-inductive answer. The boolean ``conforms`` stays the
        greatest-fixpoint verdict for backward compatibility.

        targets_native=True asserts that ``focus`` is EXACTLY the
        unfiltered target_focus(...) of this schema over these triples
        — enabling the one-pass target fast path for eligible shapes
        (callers that filter/subset the focus must leave it False).

        ``focus`` may be a zero-arg callable returning the focus
        DataFrame: for all-fast-path schemas the focus relation is
        only consumed by the (lazy) report assembly, so a callable
        defers its whole plan construction off the conformance path
        (guide §1.2 driver serial term)."""
        _focus_memo: list = []

        def _focus() -> DataFrame:
            if not _focus_memo:
                _focus_memo.append(focus() if callable(focus) else focus)
            return _focus_memo[0]

        ref_free = not self._ref_edges()
        fast_lbls: set[str] = set()
        cfast_lbls: set[str] = set()
        if ref_free and targets_native:
            fast_lbls = {lbl for lbl, sh in self.schema.shapes.items()
                         if self._fast_target_eligible(sh)}
            cfast_lbls = {lbl for lbl, sh in self.schema.shapes.items()
                          if lbl not in fast_lbls
                          and self._fast_target_cpath_eligible(sh)}
            fast_lbls |= cfast_lbls
        if ref_free:
            # no shape references: every candidate comes straight from
            # the focus relation, so ONE shared cache over the focus
            # candidates replaces k per-shape caches — the focus
            # sub-plan (union of target distincts over the full triple
            # relation) materializes once instead of once per shape,
            # and each shape's candidate set is a filter over the
            # cache. At 2M-conv bench scale this removes two full
            # focus recomputations from the conformance job's critical
            # path (Amdahl serial term, BASELINE.md round-5 notes).
            slow_lbls = [lbl for lbl in self.schema.shapes
                         if lbl not in fast_lbls]
            if slow_lbls:
                focus_slow = (_focus() if not fast_lbls else
                              _focus().filter(F.col("shape").isin(slow_lbls)))
                base = self._maybe_persist(focus_to_candidates(focus_slow))
                cands = {lbl: base.filter(F.col("shape") == lbl).drop("shape")
                         for lbl in slow_lbls}
            else:
                cands = {}
        else:
            cands = self._propagate_candidates(_focus())
            # candidate sets are reused by every constraint sub-plan of
            # a shape (fused agg, complex paths, pairwise, reports):
            # persist lazily so each materializes at most once.
            for lbl in cands:
                cands[lbl] = self._maybe_persist(cands[lbl])
        conf: dict[str, DataFrame] = {}
        lfp_conf: dict[str, DataFrame] = {}  # per-label least-fixpoint verdicts
        all_reports: list[DataFrame] = []

        for scc in self.schema.strata():
            if not self.schema.is_recursive(scc):
                lbl = scc[0]
                if lbl in fast_lbls:
                    # one-pass target fast path: no cand relation, no
                    # persist (ref-free ⇒ conformance is consumed once)
                    evaluator = (self._eval_shape_onepass_cpath
                                 if lbl in cfast_lbls
                                 else self._eval_shape_onepass)
                    c, reps = evaluator(self.schema.shapes[lbl], conf)
                    conf[lbl] = c
                    all_reports.extend(reps)
                    continue
                c, reps = self._evaluate_shape(self.schema.shapes[lbl], cands[lbl], conf)
                # lazy persist: materialized on first action, reused by
                # every ref join — no eager driver-side job per shape
                conf[lbl] = self._maybe_persist(self._maybe_flatten(c))
                all_reports.extend(reps)
            else:
                if with_status:
                    # least fixpoint first (into a scratch dict seeded
                    # with the dependencies' final verdicts)
                    scratch = dict(conf)
                    self._run_fixpoint(scc, cands, scratch, start=False)
                    for lbl in scc:
                        lfp_conf[lbl] = scratch[lbl]
                last_reports = self._run_fixpoint(scc, cands, conf, start=True)
                for reps in last_reports.values():
                    all_reports.extend(reps)

        conformance = None
        extra_cols = ([F.col("f_kind").alias("node_kind"),
                       F.col("f_dt").alias("node_dt"),
                       F.col("f_lang").alias("node_lang")]
                      if full_terms else [])
        for lbl, c in conf.items():
            status_cols = []
            if with_status:
                if lbl in lfp_conf:
                    lfp = lfp_conf[lbl].select(
                        KEY, F.col("conforms").alias("__lfp"))
                    c = c.join(lfp, on=KEY, how="left")
                    status_cols = [
                        F.when(~F.col("conforms"), F.lit("nonconformant"))
                        .when(F.coalesce(F.col("__lfp"), F.lit(False)),
                              F.lit("conformant"))
                        .otherwise(F.lit("unknown")).alias("status")]
                else:
                    status_cols = [
                        F.when(F.col("conforms"), F.lit("conformant"))
                        .otherwise(F.lit("nonconformant")).alias("status")]
            piece = c.select(
                F.col("f_value").alias("node"),
                F.lit(lbl).alias("shape"),
                F.col("conforms"),
                *extra_cols,
                *status_cols,
            )
            conformance = piece if conformance is None else conformance.unionByName(piece)

        def _assemble_report() -> DataFrame:
            # pieces are thunks (lazy report, see ValidationResult):
            # built only when a consumer actually reads the report
            if all_reports:
                report = all_reports[0]()
                for r in all_reports[1:]:
                    report = report.unionByName(r())
            else:
                from .model import REPORT_SCHEMA
                return self.spark.createDataFrame([], REPORT_SCHEMA)
            # report violations for the shapes' own focus plus
            # everything a TRANSPARENT (nested sh:property) shape
            # produced on derived candidates; opaque ref targets report
            # only via the parent's NodeConstraintComponent (SHACL
            # sh:node vs sh:property split).
            focus_nodes = _focus().select(
                F.col("node").alias("focus_node"),
                F.col("shape").alias("source_shape")).distinct()
            # NOTE: no broadcast hint — the focus set is data-sized
            # (every instance of a targetClass: millions of rows at
            # 100-TB scale); a forced broadcast would OOM the driver.
            # AQE picks broadcast on its own when the set is small.
            kept = report.join(focus_nodes,
                               on=["focus_node", "source_shape"],
                               how="left_semi")
            transparent = [lbl for lbl, sh in self.schema.shapes.items()
                           if sh.transparent]
            if transparent:
                kept = kept.unionByName(
                    report.filter(F.col("source_shape").isin(transparent)))
            return kept

        if not ref_free:
            # ref schemas propagate candidates BEYOND the focus (values
            # reachable via shape refs get their own conformance rows);
            # restrict the output to the asked-for associations. For
            # ref-free schemas conf == focus by construction (candidates
            # ARE the focus split per shape), so the semi-join — and
            # its full recomputation of the focus sub-plan — is skipped.
            focus_pairs = _focus().select("node", "shape").distinct()
            conformance = conformance.join(focus_pairs,
                                           on=["node", "shape"],
                                           how="left_semi")
        return ValidationResult(conformance=conformance,
                                report_fn=_assemble_report)


def pred_pairs_for(triples: DataFrame, iri: str, srcs: DataFrame) -> DataFrame:
    from .paths import pred_pairs
    return pred_pairs(triples, iri, srcs)
