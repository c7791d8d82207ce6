from solr_spark.analysis.chains import (  # noqa: F401
    CODE_STOPWORDS,
    AnalyzerChain,
    CODE_CHAIN,
    CODE_FOLD_CHAIN,
    CODE_PORTER_CHAIN,
    CODE_STEM_CHAIN,
    TEXT_CHAIN,
    shingles,
    tokenize_py,
)
