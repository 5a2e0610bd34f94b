package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Q19 — the arbitrary-SQL surface (streamlit_app/app5.py:263-276):
  * a DataFrame is registered as a temp view and user-supplied SQL text
  * runs through the full Catalyst lifecycle (parse → analyze →
  * optimize → physical plan). Errors surface to the caller exactly as
  * `spark.sql` raises them (the reference shows them via st.error).
  */
object SqlSurface {
  def run(spark: SparkSession, df: DataFrame, viewName: String,
          sqlText: String): DataFrame = {
    df.createOrReplaceTempView(viewName)
    spark.sql(sqlText)
  }
}
