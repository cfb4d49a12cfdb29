package rlds;

import org.apache.spark.sql.api.java.UDF2;

/** Normalized Damerau-Levenshtein similarity UDF (null in -> null;
 * the Column wrapper maps missing -> 0.0).  VERDICT r4 item 5: DL was
 * the one kernel without a JVM twin — a config routing the name field
 * through DL refinement re-introduced a Python worker into the
 * scoring stage. */
public class DlSim implements UDF2<String, String, Double> {
    @Override
    public Double call(String a, String b) {
        if (a == null || b == null) {
            return null;
        }
        return Kernels.dlNormalized(a, b);
    }
}
