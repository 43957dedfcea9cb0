

def test_scrub_pii_counts_and_redaction(spark):
    from local_stream_stack_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@test.org or b@x.io thanks"),
            (2, "call +1-555-123-4567 from 192.168.0.1 now"),
            (3, "no pii here at all"),
            (4, ""),
            # overlap (ADVICE r7 #3): the ipv4-looking domain is
            # consumed by the earlier email redaction — n_ipv4 must
            # be 0 (counts are redaction counts, staged), and
            # pii_chars_removed must equal the email span only
            (5, "ping a@1.2.3.4.co ok"),
        ],
        "id long, text string",
    )
    out = {r.id: r for r in scrub_pii(df, "text").collect()}
    assert (out[1].n_email, out[1].n_phone, out[1].n_ipv4) == (2, 0, 0)
    assert out[1].redacted == "mail me at <EMAIL> or <EMAIL> thanks"
    # removed chars = original span lengths
    assert out[1].pii_chars_removed == len("a.b+c@test.org") + len("b@x.io")
    assert (out[2].n_email, out[2].n_phone, out[2].n_ipv4) == (0, 1, 1)
    assert out[2].redacted == "call <PHONE> from <IPV4> now"
    assert out[3].redacted == "no pii here at all"
    assert out[3].pii_chars_removed == 0
    assert out[4].pii_chars_removed == 0
    assert (out[5].n_email, out[5].n_phone, out[5].n_ipv4) == (1, 0, 0)
    assert out[5].redacted == "ping <EMAIL> ok"
    assert out[5].pii_chars_removed == len("a@1.2.3.4.co")
