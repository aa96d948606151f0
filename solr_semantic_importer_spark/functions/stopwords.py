"""English stop set shared by the text_en / text_en_splitting chains.

The standard Lucene/Solr English set shipped as lang/stopwords_en.txt
(managed-schema.xml:354-357 references it; 33 words, the public
EnglishAnalyzer default). Its own module so analysis chains can share it
without import cycles.
"""

EN_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)
