package rlds;

import org.apache.spark.sql.api.java.UDF2;

/** Ratcliff-Obershelp similarity UDF (null in -> null; the Column
 * wrapper maps missing -> 0.0). */
public class RoSim implements UDF2<String, String, Double> {
    @Override
    public Double call(String a, String b) {
        if (a == null || b == null) {
            return null;
        }
        return Kernels.ro(a, b);
    }
}
