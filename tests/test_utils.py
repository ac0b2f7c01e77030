from df_to_azure_spark.utils import sanitize_identifier


def test_sanitize_identifier():
    # reference adf.py:55-58 character class, plus whitespace
    assert sanitize_identifier("a<b>c*d#e.f%g&h:i\\j+k?l/m n") == "a-b-c-d-e-f-g-h-i-j-k-l-m-n"
    assert sanitize_identifier("clean_name-1") == "clean_name-1"
