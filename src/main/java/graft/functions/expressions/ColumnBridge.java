package graft.functions.expressions;

import org.apache.spark.sql.Column;
import org.apache.spark.sql.catalyst.expressions.Expression;

/**
 * Bridge between Catalyst {@link Expression}s and public {@link Column}s.
 *
 * Spark 4 moved Expression-backed Column construction behind
 * {@code org.apache.spark.sql.classic.ExpressionUtils}, whose methods are
 * {@code private[sql]} at the Scala level but public in bytecode; calling
 * through Java sidesteps the Scala access check without touching any
 * internal state. (Same technique Spark's own Java tests use.)
 */
public final class ColumnBridge {
  private ColumnBridge() {}

  public static Column column(Expression e) {
    return org.apache.spark.sql.classic.ExpressionUtils.column(e);
  }

  public static Expression expression(Column c) {
    return org.apache.spark.sql.classic.ExpressionUtils.expression(c);
  }

  /**
   * {@code collect_top_k(child, num, reverse)} as a complete aggregate
   * expression. {@code CollectTopK} is {@code private[sql]} at the Scala
   * level (the pickle blocks scalac), but its bytecode is public — the
   * same Java sidestep as {@link #column(Expression)} above. See
   * graft.functions.expressions.TopKAggregate for the semantics and the
   * measured sort-spill failure this replaces.
   *
   * VERSION PIN: the 5-arg constructor below (child, num, reverse,
   * mutableAggBufferOffset = 0, inputAggBufferOffset = 0) is compiled
   * against Spark 4.1.2 ({@code /opt/spark/jars/spark-catalyst_2.13-4.1.2.jar}).
   * A Spark bump that changes CollectTopK's arity fails HERE at compile
   * time (javac resolves the constructor against the new jar), and
   * TopKAggregateSpec pins the runtime ordering convention as the
   * semantic canary.
   */
  public static Expression collectTopK(Expression child, int num, boolean reverse) {
    return new org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK(
        child, num, reverse, 0, 0).toAggregateExpression();
  }
}
