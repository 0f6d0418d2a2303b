"""End-to-end corpus curation: the published crawl-to-training-set
cascade as ONE composed Spark plan with per-stage audit metrics.

This is the workflow the individual operators exist for, in the order
the public pipelines run it (CCNet Wenzek 2020; Gopher Rae 2021 §A1;
RefinedWeb Penedo 2023 §3; GPT-3 Brown 2020 appendix A
decontamination):

    normalize -> exact dedup -> boilerplate/line dedup -> span dedup
    -> quality gate -> near-dup dedup -> per-domain host cap
    -> eval decontamination -> PII

Every stage is the already-tested operator; this module only
composes, instruments, and documents the ordering rationale:

* dedup BEFORE the quality gate — duplicates vote: a million copies
  of one spam page would otherwise dominate gate statistics you tune;
* boilerplate/line dedup BEFORE span/near-dup — removing shared
  banners first stops them from gluing unrelated documents into one
  near-dup cluster;
* decontamination LAST among the deleters — eval grams must be
  checked against the text the model will actually see (post-rewrite);
* PII redaction at the end — a REWRITE, not a filter; running it
  earlier would change dedup hashes under the auditor's feet.

Instrumentation uses ``DataFrame.observe``: each stage appends a
named Observation counting its OUTPUT rows, so one caller action
(the final write/count) yields the whole per-stage funnel with ZERO
extra jobs — at 100 TB you cannot afford a count() per stage. Two
honest exceptions, documented per stage: near-dup dedup runs a
bounded internal convergence loop (one scalar action per round on a
checkpointed label frame), and decontamination prepares its eval
side eagerly (driver-bounded, KB-MB). Both are the operators' own
documented contracts, not pipeline overhead.

Reference parity: the reference engine's three fixed pipelines
(`down/down_water_prep.py`, `direct_water_prep.py`, `compare.py`)
are the same idea — a composed, gated, audited cascade — over
tabular water data; this is the corpus-curation counterpart the
north-star scope adds (SURVEY §2.9 X1/X2/X4/X9).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class CurationResult:
    """The curated frame plus the observation funnel. Run ONE action
    on ``df`` (write, count, collect), then call :meth:`report`."""

    df: DataFrame
    input_rows: Observation | None
    stages: list[tuple[str, Observation]] = field(default_factory=list)
    #: stage-name -> that stage's OUTPUT frame; populated only under
    #: ``stage_barrier=True`` (each frame is then a materialized
    #: checkpoint, so counting/sampling one costs no cascade re-run).
    frames: dict[str, DataFrame] = field(default_factory=dict)

    def report(self) -> list[tuple[str, int]]:
        """Per-stage output row counts, input first. Blocks until the
        observations are available — i.e. call AFTER the action."""
        out = []
        if self.input_rows is not None:
            out.append(("input", int(self.input_rows.get["rows"])))
        for name, obs in self.stages:
            out.append((name, int(obs.get["rows"])))
        return out


def _observed(df: DataFrame, name: str, stages: list) -> DataFrame:
    obs = Observation(name)
    out = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    stages.append((name, obs))
    return out


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    url_filter: dict | None = None,
    html_extract: dict | bool = False,
    unicode_normalize: bool = False,
    exact_dedup: bool = True,
    boilerplate_min_docs: int | None = None,
    line_dedup: bool = False,
    span_dedup: dict | None = None,
    quality_gate: dict | bool = False,
    classifier_gate: dict | None = None,
    near_dup: dict | bool = False,
    host_cap: dict | None = None,
    decontaminate_eval: DataFrame | None = None,
    decontaminate_n: int = 13,
    redact: bool = False,
    audit: bool = True,
    stage_barrier: bool = False,
) -> CurationResult:
    """Compose the curation cascade over ``(id_col, text_col, ...)``.

    Flags select stages; dicts pass operator kwargs through
    (``span_dedup={"min_chunk": 32}``, ``near_dup={"threshold":
    0.8}``, ``quality_gate={"thresholds": {...}}``). ``audit=False``
    skips the observations entirely (no overhead at all).

    ``stage_barrier`` (r13, guide §3.3/§5 "materialise an intermediate
    to truncate the plan"): eagerly ``localCheckpoint`` each stage's
    output and expose it in ``result.frames[name]``. For a caller that
    re-reads stage outputs — a per-stage funnel computed as ROWS of
    one result frame (the w03 oracle contract, where observe() cannot
    feed the output), stage sampling, per-stage audits — the barrier
    makes each stage compute exactly ONCE; without it every re-read
    re-runs the whole cascade prefix (w03's funnel paid the cascade
    ~5x, a 118-Exchange plan). Single-action audit=True callers should
    keep it OFF: the observe() funnel is already zero-cost and the
    barrier spends memory/disk on materialization. At 100 TB the same
    pattern is a checkpoint TABLE per stage (write+read-back), which
    also gives cross-job restart points.
    ``url_filter`` (r10) runs RefinedWeb §3.1's stage 0 FIRST — drop
    rows by URL against a domain blocklist before any content work:
    ``{"blocklist": frame, "url_col": "url"}`` plus any
    url_blocklist_filter kwarg (e.g. ``match_on="registered_domain",
    psl=load_psl()`` for the strict PSL-keyed form).

    ``html_extract`` (r10) runs main-content extraction (stage 0.5 —
    the trafilatura position in RefinedWeb's cascade: after the URL
    cut, before any text analysis): the input's ``html_col`` (default
    ``"html"``) extracts through ``operators/content.
    extract_main_content`` INTO ``text_col``, so every later stage
    sees boilerplate-free text. ``True`` = defaults; a dict passes
    content_blocks kwargs (``min_len``, ``max_link_density``,
    ``min_stopword_frac``, plus ``html_col``/``drop_empty``).
    ``drop_empty`` (default True) drops documents whose page yields no
    content block — audited as part of the stage's funnel row.

    ``classifier_gate`` (r12, VERDICT r11 item 5): ``{"model": a
    trained ``classify.LRModel``, "threshold": t}`` — keep documents
    the TRAINED quality classifier scores ``lr_prob >= t``, after the
    heuristic gate and before near-dup/cap; pick ``t`` with
    ``classify.pr_sweep`` (the GPT-3-appendix-A operating-point step).

    ``host_cap`` (r11, VERDICT r10 item 6) runs the C4/RefinedWeb
    per-registered-domain frequency cap (``operators/sampling.
    cap_per_group``): ``{"max_docs": N}`` plus ``url_col`` (default
    ``"url"``), optional ``psl`` (a ``functions.urls.load_psl()``
    ruleset for exact registrable-domain grouping; the short built-in
    suffix table otherwise), and any cap_per_group kwarg (``order_by``
    to keep the BEST N per domain, ``seed``, ``plan``, ``mode``).
    Documents without a parseable host are NEVER capped (each forms
    its own group). **Placement — documented choice**: the cap runs
    LATE, after dedup and the quality gate and before
    decontamination, so it counts SURVIVORS — the documents the model
    would actually see. Capping at stage 0 is cheaper but spends cap
    slots on rows later deleted by dedup/quality, systematically
    under-filling hot domains; and dedup must precede the cap anyway
    (duplicates would consume their host's slots). The split plan's
    double evaluation is checkpoint-protected here exactly like
    near_dup's internal rescans.

    Returns :class:`CurationResult`; the frame keeps ``id_col`` and
    ``text_col`` plus any other input columns EXCEPT through the
    line-granularity rewriters, which rebuild text and therefore
    project to (id, text) + audit counts — join extra columns back on
    ``id_col`` afterwards if you need them (documented operator
    contract, not a pipeline choice).
    """
    from waterdata_spark.functions.text import gopher_gate, normalize_unicode, redact_pii
    from waterdata_spark.operators import dedup as D

    stages: list[tuple[str, Observation]] = []
    frames: dict[str, DataFrame] = {}
    input_obs = None
    cur = df
    if audit:
        input_obs = Observation("curate_input")
        cur = cur.observe(input_obs, F.count(F.lit(1)).alias("rows"))

    def mark(frame: DataFrame, name: str) -> DataFrame:
        out = _observed(frame, name, stages) if audit else frame
        if stage_barrier:
            # EAGER on purpose: a lazy fill would re-run the stage on
            # the first downstream action anyway, and with audit=True
            # it would skip upstream observe() nodes (the near_dup
            # lesson below); eager fires each observation exactly once.
            out = out.localCheckpoint(eager=True)
            frames[name] = out
        return out

    if url_filter is not None:
        # RefinedWeb §3.1's stage 0 (r10): drop documents by URL against
        # a domain blocklist BEFORE any content work — the cheapest cut
        # first. kwargs pass through to url_blocklist_filter, e.g.
        # {"blocklist": df, "url_col": "url"} or the strict form
        # {"blocklist": df, "match_on": "registered_domain", "psl": psl}.
        from waterdata_spark.operators.urlfilter import url_blocklist_filter

        kwargs = dict(url_filter)
        bl = kwargs.pop("blocklist", None)
        if bl is None:
            raise ValueError("url_filter requires a 'blocklist' frame")
        cur = mark(url_blocklist_filter(cur, bl, **kwargs), "url_filter")

    if isinstance(html_extract, dict) or html_extract:
        from waterdata_spark.operators.content import extract_main_content

        kwargs = dict(html_extract) if isinstance(html_extract, dict) else {}
        html_col = kwargs.pop("html_col", "html")
        drop_empty = kwargs.pop("drop_empty", True)
        src = cur.drop(text_col) if text_col in cur.columns else cur
        extracted = extract_main_content(
            src, id_col=id_col, html_col=html_col, out_col=text_col, **kwargs
        ).drop(html_col)
        if drop_empty:
            extracted = extracted.filter(F.col(text_col) != "")
        cur = mark(extracted, "html_extract")

    if unicode_normalize:
        cur = mark(
            cur.withColumn(text_col, normalize_unicode(text_col)), "normalize"
        )

    if exact_dedup:
        cur = mark(D.exact_dedup(cur, [text_col], id_col), "exact_dedup")

    if boilerplate_min_docs is not None:
        cur = mark(
            D.remove_boilerplate_lines(
                cur, id_col, text_col, min_docs=boilerplate_min_docs
            ),
            "boilerplate",
        )

    if line_dedup:
        cur = mark(D.dedup_lines_global(cur, id_col, text_col), "line_dedup")

    if span_dedup is not None:
        cur = mark(
            D.dedup_spans_global(cur, id_col, text_col, **span_dedup), "span_dedup"
        )

    # dict|bool stage params: a dict — INCLUDING the empty dict, the
    # natural "enable with defaults" spelling — always enables the
    # stage; plain truthiness would silently skip `{}` (ADVICE r8).
    if isinstance(quality_gate, dict) or quality_gate:
        kwargs = quality_gate if isinstance(quality_gate, dict) else {}
        cur = mark(gopher_gate(cur, text_col, **kwargs), "quality_gate")

    if classifier_gate is not None:
        # r12 (VERDICT r11 item 5): gate on a TRAINED quality classifier
        # at a chosen operating point — the published-pipeline step the
        # heuristic gate approximates (GPT-3 appendix A trains an LR
        # quality classifier and keeps documents by score; CCNet/LLaMA
        # gate on a fastText-style model). ``{"model": LRModel,
        # "threshold": t}`` keeps rows with ``lr_prob >= t`` — pick t
        # with ``classify.pr_sweep`` over a labeled slice (the
        # documented threshold-selection step; the sweep returns exact
        # confusion counts per candidate threshold). Runs AFTER the
        # heuristic gate (cheap bands first, model score on the
        # survivors) and BEFORE near-dup/cap (the same
        # count-the-survivors rationale as host_cap). Scoring is one
        # broadcast join + map-side margin sum (lr_score's documented
        # shape) — no extra shuffle of the corpus. Extra kwargs pass
        # through to ``lr_score`` (e.g. ``prob_dp``).
        from waterdata_spark.operators.classify import lr_score

        kwargs = dict(classifier_gate)
        model = kwargs.pop("model")
        thr = kwargs.pop("threshold")
        scored = lr_score(cur, model, id_col=id_col, text_col=text_col, **kwargs)
        cur = mark(
            scored.filter(F.col("lr_prob") >= F.lit(float(thr)))
            .drop("lr_prob", "lr_pred"),
            "classifier_gate",
        )

    if isinstance(near_dup, dict) or near_dup:
        # internal bounded convergence actions — the operator's
        # documented contract (min-id label propagation to fixpoint).
        # Materialize the cascade ONCE here: the near-dup internals
        # scan their input 3+ times (candidate pairs, Jaccard verify,
        # survivor semi-join), and without a barrier each scan re-runs
        # every upstream stage (measured at 5k docs: 33 -> 17s). The
        # checkpoint is EAGER: the lazy form skips upstream observe
        # nodes on post-fill actions and silently zeroes their funnel
        # counts (found by the probe's funnel assertion); eager fills
        # fire every upstream observation exactly once, correctly.
        # This stage already runs internal actions, so the barrier
        # does not change the "one caller action" story near_dup=False
        # users get. With audit=False there are no observe nodes to
        # protect, so the cheaper lazy fill is safe (measured 17 vs
        # 22s at 5k docs).
        kwargs = near_dup if isinstance(near_dup, dict) else {}
        from waterdata_spark.operators.dedup_approx import minhash_dedup

        cur = cur.localCheckpoint(eager=audit)
        cur = mark(minhash_dedup(cur, id_col, text_col, **kwargs), "near_dup")

    if host_cap is not None:
        from waterdata_spark.operators.sampling import cap_per_group

        kwargs = dict(host_cap)
        url_col = kwargs.pop("url_col", "url")
        max_docs = kwargs.pop("max_docs")
        psl = kwargs.pop("psl", None)
        plan = kwargs.pop("plan", "split")
        if plan == "split":
            # the split plan evaluates its input twice; an eager
            # checkpoint keeps upstream observations single-fire and
            # the double evaluation deterministic (the near_dup lesson
            # + the cap_per_group determinism contract)
            cur = cur.localCheckpoint(eager=audit)
        if psl is not None:
            from waterdata_spark.operators.urlfilter import registered_domains_psl

            cur = registered_domains_psl(
                cur, psl, url_col=url_col, out_col="__host_grp"
            )
        else:
            from waterdata_spark.functions.urls import registered_domain, url_host

            cur = cur.withColumn(
                "__host_grp",
                F.nullif(registered_domain(url_host(F.col(url_col))), F.lit("")),
            )
        # hostless documents are never capped: each forms its own group
        grp = F.coalesce(
            F.col("__host_grp"),
            F.concat(F.lit("__nohost:"), F.col(id_col).cast("string")),
        )
        capped = cap_per_group(
            cur.withColumn("__host_grp", grp),
            "__host_grp",
            max_docs,
            id_col=id_col,
            plan=plan,
            **kwargs,
        )
        cur = mark(capped.drop("__host_grp"), "host_cap")

    if decontaminate_eval is not None:
        from waterdata_spark.operators.decontaminate import decontaminate

        cur = mark(
            decontaminate(
                cur,
                decontaminate_eval,
                n=decontaminate_n,
                id_col=id_col,
                text_col=text_col,
            ),
            "decontaminate",
        )

    if redact:
        cur = mark(cur.withColumn(text_col, redact_pii(text_col)), "redact_pii")

    return CurationResult(df=cur, input_rows=input_obs, stages=stages, frames=frames)
