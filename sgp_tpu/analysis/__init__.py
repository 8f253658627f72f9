from sgp_tpu.analysis.whiteness import (AZWhitenessMultiTestResult,
                                        AZWhitenessTestResult,
                                        az_whiteness_test)

__all__ = ["AZWhitenessMultiTestResult", "AZWhitenessTestResult",
           "az_whiteness_test"]
