#!/usr/bin/env python3
"""One-shot mechanical splitter for Behavioral.scala (round-15 verdict
item 6): moves QueryDef blocks verbatim into domain files, zero query
changes. Kept in scripts/ as the audit trail of HOW the split was done."""
import re, sys

SRC = "/root/repo/src/main/scala/graft/operators/Behavioral.scala"
OUT = "/root/repo/src/main/scala/graft/operators/"

ASSIGN = {}
def grp(name, qs):
    for q in qs.split():
        assert q not in ASSIGN, q
        ASSIGN[q] = name

grp("Journeys", """q_funnel q_event_transitions q_windowed_funnel
  q_time_to_convert q_first_touch q_path_triples q_position_attribution
  q_time_decay_attribution q_attribution_compare q_shapley_attribution
  q_top_paths q_dwell_histogram q_sequence_surprisal q_markov_stationary
  q_absorption_steps q_disorder_profile q_self_excitation""")
grp("TimeSeries", """q_seasonal_naive q_wow_growth q_autocorr
  q_seasonality_strength q_changepoint q_ewma q_forecast_skill q_lag_corr
  q_mann_kendall q_acf q_stl_lite q_granger q_value_quantile_trend q_pacf
  q_ljung_box q_hurst q_control_chart q_dickey_fuller q_croston
  q_pinball_eval q_theilsen q_runs_test q_quantile_drift q_feature_drift
  q_psi q_mix_shift q_wasserstein""")
grp("Experimentation", """q_ab_assign q_mannwhitney q_bootstrap_ci q_cuped
  q_power_analysis q_did q_propensity_strat q_welch_ttest q_anova
  q_srm_check q_fdr_bh q_msprt q_tost q_funnel_ci q_mde_curve
  q_kruskal_wallis q_friedman q_sign_test q_cmh_test q_obrien_fleming
  q_holm_bonferroni q_crosstab_residuals q_wilson_ci q_ipw_ate q_iv_wald
  q_reg_discontinuity q_capture_recapture q_variance_decomp q_partial_corr
  q_kendall_tau q_mutual_info q_trimmed_mean q_benford q_eb_shrinkage
  q_weighted_median""")
grp("Evaluation", """q_calibration q_pr_curve q_cohens_kappa
  q_brier_decomp q_roc_auc q_macro_f1 q_conformal q_ransac_fit""")
grp("SupplyChain", """q_eoq q_bullwhip q_brand_switch q_cross_elasticity
  q_chain_ladder q_gini_customer q_atkinson q_decay_popularity q_ucb1
  q_bcg_matrix q_erlang_c q_conditional_value q_repurchase_interval
  q_orders_cohort""")
grp("Survival", "q_survival_km q_weibull_fit q_exp_gof")
# everything else stays in Behavioral

lines = open(SRC).read().split("\n")  # 0-indexed

# QueryDef block starts
starts = [i for i, l in enumerate(lines) if l == "    QueryDef("]
assert len(starts) == 132, len(starts)
names = []
for i in starts:
    m = re.match(r'\s+"(q_\w+)",?$', lines[i + 1])
    assert m, lines[i + 1]
    names.append(m.group(1))
for q in ASSIGN:
    assert q in names, q

# block start = walk back over comment/blank lines
def block_start(i):
    j = i
    while j > 0 and (lines[j - 1].lstrip().startswith("//") or lines[j - 1].strip() == ""):
        j -= 1
    return j

bstarts = [block_start(i) for i in starts]
# Seq close: first '  )' line after the last QueryDef start
seq_close = next(i for i in range(starts[-1], len(lines)) if lines[i] == "  )")
bends = bstarts[1:] + [seq_close]  # exclusive

blocks = {}
for n, a, b in zip(names, bstarts, bends):
    txt = lines[a:b]
    # strip trailing blank lines, ensure trailing comma on last code line
    while txt and txt[-1].strip() == "":
        txt.pop()
    if not txt[-1].rstrip().endswith(","):
        txt[-1] = txt[-1] + ","
    blocks[n] = txt

# helper defs (between seq_close+1 and final '}'), each with its scaladoc
helper_text = "\n".join(lines[seq_close + 1:len(lines) - 2]).rstrip()
helpers = {}
for m in re.finditer(r'(  /\*\*.*?\n  private def (\w+):.*?\n  \})', helper_text, re.S):
    helpers[m.group(2)] = m.group(1)
assert set(helpers) == {"absorptionOracle", "erlangOracle", "markovOracle"}, helpers.keys()

HEADERS = {
"Journeys": '''/** User-journey analytics over the `events` stream: ordered conversion
  * funnels, touch attribution (first/position/time-decay/Shapley), path
  * mining, and the Markov-chain family (stationary distribution,
  * absorption steps). Split from [[Behavioral]] round 15 (mechanical
  * move, zero query changes); the sequencing shapes all shuffle once on
  * `user_id` and reduce to bounded type-pair domains after that.
  */''',
"TimeSeries": '''/** Time-series and drift analytics over daily/hourly rollups:
  * autocorrelation (ACF/PACF/Ljung-Box), trend and stationarity tests,
  * changepoints, EWMA/STL/forecast-skill, and the distribution-drift
  * family (PSI, Wasserstein, quantile drift). Split from [[Behavioral]]
  * round 15 (mechanical move, zero query changes); every query first
  * reduces events to a CALENDAR-bounded series (days/hours), so the
  * post-aggregation math is scale-free.
  */''',
"Experimentation": '''/** Experimentation and statistical-inference battery: A/B assignment,
  * two-sample and k-sample tests, sequential designs (mSPRT,
  * O'Brien-Fleming), multiple-testing control, causal estimators
  * (DiD, IPW, IV, RD, propensity strata), and the robust/association
  * statistics. Split from [[Behavioral]] round 15 (mechanical move,
  * zero query changes); tests reduce to per-group sufficient statistics
  * in one map-combined pass, so group count — never row count — bounds
  * the driver-side math.
  */''',
"Evaluation": '''/** Classifier and predictor evaluation: calibration, PR/ROC curves,
  * Brier decomposition, macro-F1, agreement (Cohen's kappa), conformal
  * intervals, and robust RANSAC fitting. Split from [[Behavioral]]
  * round 15 (mechanical move, zero query changes); curves aggregate to
  * score-bucket grain before any window, so the ranked frames are
  * bounded by the score domain, not the row count.
  */''',
"SupplyChain": '''/** Commerce and operations analytics over orders/lineitem: inventory
  * (EOQ, Croston-adjacent demand), bullwhip, elasticity, brand
  * switching, portfolio (BCG), concentration (Gini/Atkinson), queueing
  * (Erlang C), bandits (UCB1), and claims development (chain ladder).
  * Split from [[Behavioral]] round 15 (mechanical move, zero query
  * changes); each reduces facts to a product/period grain first, and
  * the fixed-point recursions run on bounded domains.
  */''',
}

order = {f: [] for f in ["Journeys", "TimeSeries", "Experimentation", "Evaluation", "SupplyChain", "Survival", "Behavioral"]}
for n in names:
    order[ASSIGN.get(n, "Behavioral")].append(n)

IMPORTS = '''package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

'''

HELPER_OWNER = {"Journeys": ["absorptionOracle", "markovOracle"],
                "SupplyChain": ["erlangOracle"]}

for f in ["Journeys", "TimeSeries", "Experimentation", "Evaluation", "SupplyChain"]:
    body = []
    for n in order[f]:
        body.extend(blocks[n])
        body.append("")
    while body and body[-1] == "":
        body.pop()
    out = IMPORTS + HEADERS[f] + f"\nobject {f} {{\n\n  val defs: Seq[QueryDef] = Seq(\n\n"
    out += "\n".join(body) + "\n  )\n"
    for h in HELPER_OWNER.get(f, []):
        out += "\n" + helpers[h] + "\n"
    out += "}\n"
    open(OUT + f + ".scala", "w").write(out)
    print(f, len(order[f]), "queries,", out.count("\n"), "lines")

# rewrite Behavioral with remaining blocks, original header, no helpers
head = lines[:bstarts[0]]  # package..."val defs = Seq(" + blank
body = []
for n in order["Behavioral"]:
    body.extend(blocks[n])
    body.append("")
while body and body[-1] == "":
    body.pop()
out = "\n".join(head) + "\n" + "\n".join(body) + "\n  )\n}\n"
open(SRC, "w").write(out)
print("Behavioral", len(order["Behavioral"]), "queries,", out.count("\n"), "lines")

# splice the survival trio into Survival.scala before its Seq close
SURV = OUT + "Survival.scala"
slines = open(SURV).read().split("\n")
sclose = max(i for i, l in enumerate(slines) if l == "  )")
add = []
for n in order["Survival"]:
    add.append("")
    add.extend(blocks[n])
slines[sclose:sclose] = add
open(SURV, "w").write("\n".join(slines))
print("Survival +", len(order["Survival"]), "queries")
