"""Plan pins for the TPC-H shape-completion module (queries/tpch.py).

Each test asserts the property that makes the shape survive 100 TB —
not the result (the oracle gate owns that), but the physical plan:
semi joins stay semi, dimension chains broadcast, disjunctive bounds
reach both scans, correlated subqueries stay aggregate-then-join
(hash joins, never nested loops re-executing a subplan per row).
"""

from __future__ import annotations

import re

from zylyty_data_engineer_challenge_spark.queries import tpch

from test_plans import SF_DIR, count_nodes, formatted_plan, physical_plan


def test_q4_exists_is_a_single_semi_join(spark):
    """Q4's correlated EXISTS must be ONE left-semi hash join with the
    shipping-lag residual — not a per-order subquery or an inner join
    plus distinct (which would duplicate orders with several late lines
    before the aggregate)."""
    plan = physical_plan(tpch.q_order_priority_check(spark, SF_DIR))
    assert "LeftSemi" in plan, plan
    assert count_nodes(plan, "BroadcastNestedLoopJoin") == 0, plan


def test_q19_disjunction_bounds_reach_both_scans(spark):
    """Q19's defining optimization: the OR-of-conjuncts must not force a
    full scan of either side. The derived per-side bounds (brand set on
    part, quantity envelope on lineitem) must appear as pushed filters on
    the respective parquet scans."""
    plan = formatted_plan(tpch.q_disjunctive_filter(spark, SF_DIR))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    assert any("l_quantity" in p for p in pushed), plan
    assert any("p_brand" in p or "p_size" in p for p in pushed), plan


def test_q2_correlated_min_is_aggregate_then_join(spark):
    """Q2's correlated MIN subquery must execute as aggregate-then-join:
    hash equi-joins only, and the part/supplier/nation/region dims all
    broadcast (at least 3 broadcast joins in the plan)."""
    plan = physical_plan(tpch.q_min_cost_supplier(spark, SF_DIR))
    assert count_nodes(plan, "BroadcastNestedLoopJoin") == 0, plan
    assert count_nodes(plan, "CartesianProduct") == 0, plan
    assert count_nodes(plan, "BroadcastHashJoin") >= 3, plan


def test_q13_outer_join_is_pre_aggregated(spark):
    """Q13 must aggregate orders to per-customer counts BEFORE the outer
    join against the customer dim — the join's right side is the
    aggregate, so the histogram never shuffles raw order rows keyed by
    customer a second time. Pin: exactly one aggregate upstream of the
    outer join (the count), visible as the join reading from a
    HashAggregate, and no nested loop."""
    plan = physical_plan(tpch.q_customer_order_distribution(spark, SF_DIR))
    assert count_nodes(plan, "BroadcastNestedLoopJoin") == 0, plan
    # outer join present, and at least two HashAggregates (per-customer
    # count + histogram) — raw-orders outer join would show the count
    # aggregate BELOW the join only if pre-aggregated
    assert "LeftOuter" in plan or "RightOuter" in plan, plan
    assert count_nodes(plan, "HashAggregate") >= 4, plan  # partial+final x2


def test_q21_exists_pair_is_one_pass_no_self_nested_loop(spark):
    """Q21's EXISTS + NOT EXISTS pair must come from ONE per-order
    aggregate over the joined lines (countDistinct suppliers / late
    suppliers), not correlated re-scans: hash joins only."""
    plan = physical_plan(tpch.q_waiting_suppliers(spark, SF_DIR))
    assert count_nodes(plan, "BroadcastNestedLoopJoin") == 0, plan
    assert count_nodes(plan, "CartesianProduct") == 0, plan


def test_q22_anti_join_and_single_scalar_cross(spark):
    """Q22: the NOT EXISTS is a hash anti join against the deduped
    active-customer keys; the balance threshold is one single-row
    broadcast cross (the documented allowance), not a per-row subquery."""
    plan = physical_plan(tpch.q_idle_wealthy_customers(spark, SF_DIR))
    assert "LeftAnti" in plan, plan
    assert count_nodes(plan, "BroadcastNestedLoopJoin") <= 1, plan


def test_q18_having_filter_reuses_one_lineitem_aggregate(spark):
    """Q18's IN-subquery must NOT rescan lineitem: the per-order quantity
    sum is computed once and filtered (HAVING), then joined to orders.
    Pin: the plan contains exactly one lineitem scan."""
    plan = formatted_plan(tpch.q_large_volume_customers(spark, SF_DIR))
    # each scan contributes one "Location: ..." detail line
    scans = [
        ln for ln in plan.splitlines()
        if "Location" in ln and "lineitem" in ln
    ]
    assert len(scans) == 1, plan
