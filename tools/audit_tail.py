import sys, re
sys.path.insert(0, "/root/repo")
from database_anonymiser_minimiser_spark import queries as Q
from database_anonymiser_minimiser_spark.session import get_spark

NAMES = sys.argv[1:]
spark = get_spark(app_name="audit-tail")
spark.sparkContext.setLogLevel("ERROR")
for name in NAMES:
    df = Q.QUERIES[name](spark, "/root/testdata/sf0.1")
    p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    n_ex = len(re.findall(r"\(\d+\) Exchange", p))
    joins = re.findall(r"\(\d+\) (\w*Join\w*)", p)
    scans = re.findall(r"ReadSchema: struct<([^>]*)>", p)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", p)
    pyeval = len(re.findall(r"EvalPython|MapInPandas|FlatMapGroupsInPandas", p))
    widths = [len(s.split(",")) if s else 0 for s in scans]
    print(f"== {name}: Exchange={n_ex} joins={joins} pyNodes={pyeval}")
    for w, pf in zip(widths, pushed + [""] * (len(widths) - len(pushed))):
        print(f"   scan width={w} pushed=[{pf[:90]}]")
spark.stop()
